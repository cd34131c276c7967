"""sublong: long-read mapping by windowed voting + chain consensus.

Reference: longread-one/ (~6 kLoC standalone LRM copies) — subread voting
over many subreads followed by *chaining* of vote clusters along the read
(longread-mapping.c:529-660) and banded DP between anchors; reads up to
1.2 Mbp (LRMconfig.h:25).

TPU formulation: a long read is a batch of fixed 100bp windows (the
sequence axis becomes the batch axis — the reference's chaining loop is
replaced by one more round of *voting*, this time over window diagonals):

  1. each window votes through the standard vote kernel;
  2. every window candidate contributes a diagonal d = pos - 100·w;
  3. diagonals are clustered with a tolerance (the chain = the diagonal
     cluster with the most distinct windows, exactly the seed-and-vote
     trick applied one level up);
  4. the chained span is emitted with head/tail soft-clips for unchained
     windows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import dna
from ..io import sam as samio
from ..io.fastq import batch_from_records

WINDOW = 100
CHAIN_TOL = 800  # diagonal tolerance: indel drift allowed along the read


@dataclass
class LongReadHit:
    mapped: bool
    pos: int = 0          # linear genome position of the chained read start
    strand: int = 0
    clip_left: int = 0
    clip_right: int = 0
    span: int = 0         # genome bases covered
    n_windows: int = 0
    votes: int = 0


def map_long_read(aligner, seq_codes: np.ndarray, min_windows: int = 2) -> LongReadHit:
    """Map one long read (uint8 codes) with the window/chain scheme."""
    L = len(seq_codes)
    n_win = max(L // WINDOW, 1)
    seqs = []
    for w in range(n_win):
        chunk = seq_codes[w * WINDOW : (w + 1) * WINDOW]
        seqs.append(dna.decode(chunk).encode())
    batch = batch_from_records(
        [f"w{w}" for w in range(n_win)], seqs, [b"I" * len(s) for s in seqs],
        pad_to=aligner.cfg.pad_read_len,
    )
    res = aligner.align_batch(batch)
    sc_votes = res["votes"]

    # diagonal voting across windows, per strand
    best = LongReadHit(mapped=False)
    for strand in (0, 1):
        diags, weights, wins = [], [], []
        for w in range(n_win):
            if not res["mapped"][w] or int(res["strand"][w]) != strand:
                continue
            p = int(res["pos"][w])
            # a reverse-strand window at read offset w*WINDOW sits at the
            # *end* of the reverse alignment
            if strand == 0:
                d = p - w * WINDOW
            else:
                d = p + w * WINDOW
            diags.append(d)
            weights.append(int(sc_votes[w]))
            wins.append(w)
        if not diags:
            continue
        order = np.argsort(diags)
        darr = np.asarray(diags)[order]
        warr = np.asarray(wins)[order]
        varr = np.asarray(weights)[order]
        # cluster sorted diagonals within CHAIN_TOL
        i = 0
        n = len(darr)
        while i < n:
            j = i
            while j < n and darr[j] - darr[i] <= CHAIN_TOL:
                j += 1
            members = np.arange(i, j)
            n_windows = len(set(warr[members].tolist()))
            votes = int(varr[members].sum())
            if n_windows >= min_windows and (
                not best.mapped or n_windows > best.n_windows
                or (n_windows == best.n_windows and votes > best.votes)
            ):
                wmin = int(warr[members].min())
                wmax = int(warr[members].max())
                if strand == 0:
                    pos = int(darr[members].min()) + wmin * WINDOW
                    clip_left = wmin * WINDOW
                    clip_right = L - min((wmax + 1) * WINDOW, L)
                else:
                    pos = int(darr[members].min()) - wmax * WINDOW
                    clip_left = L - min((wmax + 1) * WINDOW, L)
                    clip_right = wmin * WINDOW
                span = (wmax - wmin + 1) * WINDOW
                best = LongReadHit(
                    mapped=True, pos=pos, strand=strand,
                    clip_left=clip_left, clip_right=clip_right,
                    span=min(span, L), n_windows=n_windows, votes=votes,
                )
            i = j
    return best


def sublong_file(aligner, fastq_path: str, out_sam: str, min_windows: int = 2):
    """Map a long-read FASTQ; returns (mapped, total)."""
    import gzip

    g = aligner.genome

    def opener(p):
        f = open(p, "rb")
        if f.peek(2)[:2] == b"\x1f\x8b":
            f.close()
            return gzip.open(p, "rb")
        return f

    writer = samio.make_writer(
        out_sam, g.names, [int(x) for x in g.lengths],
        sam_output=out_sam.endswith(".sam"),
    )
    mapped = total = 0
    with opener(fastq_path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                break
            seq = f.readline().strip()
            f.readline()
            qual = f.readline().strip()
            name = hdr[1:].split()[0].decode()
            total += 1
            codes = dna.encode(seq)
            hit = map_long_read(aligner, codes, min_windows=min_windows)
            seq_s = seq.decode()
            qual_s = qual.decode()
            if not hit.mapped:
                writer.write(
                    samio.SamRecord(name, samio.FLAG_UNMAPPED, "*", 0, 0, "*",
                                    seq=seq_s, qual=qual_s)
                )
                continue
            mapped += 1
            cidx, coff = g.linear_to_chro(np.asarray([hit.pos]))
            if hit.strand:
                seq_s = dna.decode(dna.revcomp(codes))
                qual_s = qual_s[::-1]
            L = len(codes)
            mid = L - hit.clip_left - hit.clip_right
            cigar = ""
            if hit.clip_left:
                cigar += f"{hit.clip_left}S"
            cigar += f"{mid}M"
            if hit.clip_right:
                cigar += f"{hit.clip_right}S"
            flag = samio.FLAG_REVERSE if hit.strand else 0
            writer.write(
                samio.SamRecord(
                    name, flag, g.names[int(cidx[0])], int(coff[0]) + 1,
                    40 if hit.n_windows > 2 else 20, cigar,
                    seq=seq_s, qual=qual_s,
                    tags=[f"NW:i:{hit.n_windows}"],
                )
            )
    writer.close()
    return mapped, total
