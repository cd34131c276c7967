"""scRNA read sources for the aligner (--scRNA_FQinput / --BCLinput).

Reference: input-blc.c input_mFQ_* (:1731-1860) — the -r argument is file
TRIPLETS (barcode+UMI fastq, optional sample-index fastq, genomic fastq)
joined by the literal separators SCRNA_FASTA_SPLIT1/2 (subread.h:39-40).
Each aligned read's name is synthesized as

    R%011d | <BC+UMI seq> | <BC+UMI qual esc> | <sampleseq> | <samplequal esc>
    R%011d | <BC+UMI seq> | <BC+UMI qual esc> | input#%04d@L%03d   (no index)

('|'-joined, input_mFQ_next_read :1779-1848); qual strings escape every
char >= '/' by +1 so '|' cannot appear inside a field.  The lane guess
upstream always yields 999 (input_mFQ_guess_lane_no :1706-1715 discards
its own result), reproduced here for name equality.

The downstream consumers (featureCounts --scSampleSheet, cellCounts) parse
these names via the same '|' convention (quant/fc_scrna.py).
"""

from __future__ import annotations

from .fastq import _open_maybe_gz, batch_from_records

SPLIT1 = "|Rsd:cCounts:mFQs|"   # between triplets (SCRNA_FASTA_SPLIT1)
SPLIT2 = "|Rsd:cCounts:1mFQ|"   # within a triplet (SCRNA_FASTA_SPLIT2)


def _esc_qual(q: bytes) -> str:
    # input_mFQ_next_read: chars >= '/' are incremented so '|' never
    # appears inside a read-name field
    return bytes(c + 1 if c >= 0x2F else c for c in q).decode()


def parse_triplets(arg: str) -> list[tuple[str, str | None, str]]:
    """-r string -> [(barcode_fq, index_fq_or_None, genomic_fq)].  A
    missing index file in ANY triplet disables index fields for ALL
    (the reference's no_file2 flag)."""
    trips = []
    no_file2 = False
    for part in arg.split(SPLIT1):
        if not part:
            continue
        fs = part.split(SPLIT2)
        f1 = fs[0]
        f2 = fs[1] if len(fs) > 1 else ""
        f3 = fs[2] if len(fs) > 2 else ""
        if len(f2) < 2:
            no_file2 = True
        trips.append((f1, f2, f3))
    return [
        (f1, None if no_file2 else f2, f3) for (f1, f2, f3) in trips
    ]


class ScRNAFastqReader:
    """Yields genomic reads (from each triplet's third file) named with
    the '|'-joined barcode/UMI/sample fields."""

    def __init__(self, triplet_arg: str, transform=None):
        self.triplets = parse_triplets(triplet_arg)
        self._file_no = -1
        self._fps = None
        self._read_no = 0
        self._transform = transform
        self._next_file()

    def _next_file(self) -> bool:
        if self._fps:
            for f in self._fps:
                if f is not None:
                    f.close()
        self._file_no += 1
        if self._file_no >= len(self.triplets):
            self._fps = None
            return False
        f1, f2, f3 = self.triplets[self._file_no]
        self._fps = (
            _open_maybe_gz(f1),
            _open_maybe_gz(f2) if f2 else None,
            _open_maybe_gz(f3),
        )
        return True

    def _next_read(self):
        while self._fps is not None:
            f1, f2, f3 = self._fps
            h1 = f1.readline()
            if not h1:
                if f3.readline():
                    raise ValueError(
                        "barcode/UMI reads exhausted before genomic reads"
                    )
                if not self._next_file():
                    return None
                continue
            bc_seq = f1.readline().strip()
            f1.readline()
            bc_qual = f1.readline().strip()
            name = f"R{self._read_no:011d}|{bc_seq.decode()}|{_esc_qual(bc_qual)}"
            if f2 is not None:
                f2.readline()
                smp_seq = f2.readline().strip()
                f2.readline()
                smp_qual = f2.readline().strip()
                name += f"|{smp_seq.decode()}|{_esc_qual(smp_qual)}"
            else:
                # lane always 999: the reference's guess discards itself
                name += f"|input#{self._file_no:04d}@L999"
            if not f3.readline():
                raise ValueError(
                    "genomic reads exhausted before barcode/UMI reads"
                )
            seq = f3.readline().strip()
            f3.readline()
            qual = f3.readline().strip()
            self._read_no += 1
            return name, seq, qual
        return None

    def next_batch(self, max_reads: int, pad_to: int | None = None):
        names, seqs, quals = [], [], []
        tf = self._transform
        for _ in range(max_reads):
            r = self._next_read()
            if r is None:
                break
            name, seq, qual = r
            if tf is not None:
                seq, qual = tf(seq, qual)
            names.append(name)
            seqs.append(seq)
            quals.append(qual)
        if not names:
            return None
        return batch_from_records(names, seqs, quals, pad_to=pad_to)

    def close(self):
        if self._fps:
            for f in self._fps:
                if f is not None:
                    f.close()
            self._fps = None


class BCLReadReader:
    """--BCLinput: genomic reads from a raw Illumina run directory via
    io/bcl.py, named with the same '|' field convention (barcode+UMI from
    the index cycles; sample index + lane appended).  The reference's BCL
    names use ':' as the first separator (iBLC_current_lane_next_read
    input-blc.c:769-807); both separators are accepted by every consumer
    in this package."""

    def __init__(self, run_dir: str, transform=None):
        from .bcl import BclReader

        self._rd = BclReader(run_dir)
        segs = self._rd.segments
        self._bc_i = next(
            i for i, sg in enumerate(segs) if not sg.is_index
        )
        self._cdna_i = max(
            i for i, sg in enumerate(segs) if not sg.is_index
        )
        self._idx_i = [i for i, sg in enumerate(segs) if sg.is_index]
        self._lanes = list(self._rd.layout.lanes)
        self._lane_pos = 0
        self._cur = None     # (lane_no, LaneReads)
        self._row = 0
        self._read_no = 0
        self._transform = transform

    def _advance_lane(self) -> bool:
        if self._lane_pos >= len(self._lanes):
            self._cur = None
            return False
        lane = self._lanes[self._lane_pos]
        self._lane_pos += 1
        self._cur = (lane, self._rd.read_lane(lane))
        self._row = 0
        return True

    def next_batch(self, max_reads: int, pad_to: int | None = None):
        import numpy as np

        names, seqs, quals = [], [], []
        tf = self._transform
        while len(names) < max_reads:
            if self._cur is None or self._row >= self._cur[1].n_pf:
                if not self._advance_lane():
                    break
                continue
            lane, lr = self._cur
            r = self._row
            self._row += 1
            self._read_no += 1
            bc = lr.segments[self._bc_i][0][r].tobytes()
            bq = lr.segments[self._bc_i][1][r].tobytes()
            idx = b"".join(
                lr.segments[i][0][r].tobytes() for i in self._idx_i
            )
            iq = b"".join(
                lr.segments[i][1][r].tobytes() for i in self._idx_i
            )
            seq = lr.segments[self._cdna_i][0][r].tobytes()
            qual = lr.segments[self._cdna_i][1][r].tobytes()
            name = (
                f"R{self._read_no:011d}|{bc.decode()}|{_esc_qual(bq)}"
                f"|{idx.decode()}|{_esc_qual(iq)}|L{lane:03d}"
            )
            if tf is not None:
                seq, qual = tf(seq, qual)
            names.append(name)
            seqs.append(seq)
            quals.append(qual)
        if not names:
            return None
        return batch_from_records(names, seqs, quals, pad_to=pad_to)

    def close(self):
        pass
