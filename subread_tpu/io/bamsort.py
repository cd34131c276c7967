"""Coordinate-sorted BAM output with BAI indexing.

Reference: the threaded BAM writer's --sortReadsByCoordinates path +
16kb-window BAI builder (simple_bam_writer, sambam-file.h:240-267).
Records are buffered (refid, pos, encoded record), sorted at close, and
written in fresh BGZF blocks whose virtual offsets feed the BAI bins
(UCSC binning scheme) and the 16kb linear index.
"""

from __future__ import annotations

import struct

from .bam import BGZF_EOF, BamWriter, bgzf_compress_chunks
from .sam import parse_cigar


def reg2bin(beg: int, end: int) -> int:
    """UCSC binning scheme (SAM spec section 5.3)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


class CoordSortBamWriter:
    """BamWriter-compatible facade that coordinate-sorts and writes a BAI."""

    def __init__(self, path, contig_names, contig_lengths, rg_id=None,
                 rg_extra=None, program="subread_tpu", version="0.1.0",
                 sorted_by_coord=True):
        self.path = path
        self.names = list(contig_names)
        self.lengths = [int(x) for x in contig_lengths]
        header = ["@HD\tVN:1.0\tSO:coordinate"]
        header += [f"@SQ\tSN:{n}\tLN:{l}" for n, l in zip(self.names, self.lengths)]
        if rg_id:
            extra = ("\t" + "\t".join(rg_extra)) if rg_extra else ""
            header.append(f"@RG\tID:{rg_id}{extra}")
        header.append(f"@PG\tID:{program}\tPN:{program}\tVN:{version}")
        self._header_text = "\n".join(header) + "\n"
        self._rg_id = rg_id
        self._ref_idx = {n: i for i, n in enumerate(self.names)}
        # (refid_or_big, pos, record_bytes, ref_span)
        self._records: list[tuple[int, int, bytes, int]] = []
        # reuse BamWriter's record encoder via a scratch instance
        self._enc = BamWriter("/dev/null", self.names, self.lengths)
        self._enc._buf = bytearray()

    def write(self, rec) -> None:
        if self._rg_id:
            rec.tags.append(f"RG:Z:{self._rg_id}")
        self.write_line(rec.to_line())

    def write_line(self, line: str) -> None:
        fields = line.split("\t")
        self._enc._buf = bytearray()
        self._enc.add_sam_fields(fields)
        blob = bytes(self._enc._buf)
        refid = self._ref_idx.get(fields[2], -1)
        pos = int(fields[3]) - 1
        span = sum(n for n, op in parse_cigar(fields[5]) if op in "MDN=X") \
            if fields[5] != "*" else 1
        sortkey = refid if refid >= 0 else 1 << 30
        self._records.append((sortkey, pos, blob, max(span, 1)))

    def close(self) -> None:
        from ..utils.cleanup import unregister

        self._records.sort(key=lambda r: (r[0], r[1]))

        # header block(s)
        hdr = b"BAM\x01"
        text = self._header_text.encode()
        hdr += struct.pack("<i", len(text)) + text
        hdr += struct.pack("<i", len(self.names))
        for n, l in zip(self.names, self.lengths):
            nb = n.encode() + b"\x00"
            hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l)

        f = open(self.path, "wb")
        file_off = 0
        for block in bgzf_compress_chunks(hdr):
            f.write(block)
            file_off += len(block)

        # per-ref BAI state
        n_ref = len(self.names)
        bins: list[dict[int, list[tuple[int, int]]]] = [dict() for _ in range(n_ref)]
        linear: list[dict[int, int]] = [dict() for _ in range(n_ref)]

        # write records block-by-block, tracking virtual offsets
        i = 0
        CHUNK = 0xF000
        while i < len(self._records):
            block_data = bytearray()
            members = []
            while i < len(self._records) and len(block_data) < CHUNK:
                sortkey, pos, blob, span = self._records[i]
                members.append((sortkey, pos, len(block_data), span))
                block_data += blob
                i += 1
            blocks = list(bgzf_compress_chunks(bytes(block_data)))
            # all members live in the first (only) block if < 64KB
            assert len(blocks) == 1
            for (sortkey, pos, within, span) in members:
                if sortkey >= n_ref:
                    continue
                vbeg = (file_off << 16) | within
                vend = (file_off << 16) | (within + 1)
                b = reg2bin(pos, pos + span)
                bins[sortkey].setdefault(b, []).append((vbeg, vend))
                w0, w1 = pos >> 14, (pos + span - 1) >> 14
                for w in range(w0, w1 + 1):
                    cur = linear[sortkey].get(w)
                    if cur is None or vbeg < cur:
                        linear[sortkey][w] = vbeg
            f.write(blocks[0])
            file_off += len(blocks[0])

        f.write(BGZF_EOF)
        f.close()

        # BAI
        with open(self.path + ".bai", "wb") as bf:
            bf.write(b"BAI\x01")
            bf.write(struct.pack("<i", n_ref))
            for r in range(n_ref):
                # merge adjacent chunks per bin
                bf.write(struct.pack("<i", len(bins[r])))
                for b, chunks in sorted(bins[r].items()):
                    merged = []
                    for beg, end in chunks:
                        if merged and beg <= merged[-1][1] + (1 << 16):
                            merged[-1] = (merged[-1][0], max(merged[-1][1], end))
                        else:
                            merged.append((beg, end))
                    bf.write(struct.pack("<Ii", b, len(merged)))
                    for beg, end in merged:
                        bf.write(struct.pack("<QQ", beg, end))
                nwin = (max(linear[r]) + 1) if linear[r] else 0
                bf.write(struct.pack("<i", nwin))
                last = 0
                for w in range(nwin):
                    v = linear[r].get(w, last)
                    last = v
                    bf.write(struct.pack("<Q", v))
        unregister(self.path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
