"""sublong: long-read mapping by windowed voting + chain consensus.

Reference: longread-one/ (~6 kLoC standalone LRM copies) — subread voting
over many subreads followed by *chaining* of vote clusters along the read
(longread-mapping.c:529-660), indel/junction events between chained
anchors (LRMchro-event.c), reads up to 1.2 Mbp (LRMconfig.h:25).

TPU formulation: a long read is a batch of fixed 100bp windows (the
sequence axis becomes the batch axis — the reference's chaining loop is
replaced by one more round of *voting*, this time over window diagonals):

  1. windows of MANY reads are mapped in one device batch;
  2. every window candidate contributes a diagonal d = pos - 100·w;
  3. per read, diagonals are clustered with a tolerance (the chain = the
     diagonal cluster with the most distinct windows — seed-and-vote one
     level up);
  4. within the winning chain, genome-vs-read distance deltas between
     consecutive chained windows become D/I CIGAR events (N when the
     deletion is intron-sized) — the LRMchro-event analog;
  5. unchained head/tail windows become soft clips.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import dna
from ..io import sam as samio
from ..io.fastq import batch_from_records

WINDOW = 100
CHAIN_TOL = 800    # diagonal tolerance: indel drift allowed along the read
MIN_INTRON = 50    # deletions at least this long are written as N (intron)


@dataclass
class LongReadHit:
    mapped: bool
    pos: int = 0          # linear genome position of the chained read start
    strand: int = 0
    clip_left: int = 0
    clip_right: int = 0
    cigar_ops: list = field(default_factory=list)  # [(n, op)] between clips
    span: int = 0         # genome bases covered
    n_windows: int = 0
    votes: int = 0


def _chain_to_cigar(wins: np.ndarray, gpos: np.ndarray, L: int, strand: int):
    """CIGAR ops for one chained window set.

    wins: window indices (fwd-read numbering), gpos: genome start of each
    window's 100bp block.  For strand 1 the blocks are emitted in genome
    order (reversed window order) since the SAM record holds the rc read.
    Returns (clip_left, ops, clip_right, genome_pos) in SAM (genome)
    orientation."""
    order = np.argsort(gpos)
    w = wins[order]
    g = gpos[order]
    n = len(w)
    ops: list[tuple[int, str]] = [(WINDOW, "M")]
    for i in range(1, n):
        # read distance between consecutive blocks, in genome orientation
        dw = abs(int(w[i]) - int(w[i - 1])) - 1
        dr = dw * WINDOW
        dg = int(g[i]) - (int(g[i - 1]) + WINDOW)
        if dg < 0:
            # overlapping blocks (repeat artefact): merge conservatively
            ops.append((max(WINDOW + dg, 1), "M"))
            continue
        m = min(dr, dg)
        if m:
            ops.append((m, "M"))
        if dg > dr:
            ops.append((dg - dr, "N" if dg - dr >= MIN_INTRON else "D"))
        elif dr > dg:
            ops.append((dr - dg, "I"))
        ops.append((WINDOW, "M"))
    # merge adjacent Ms
    merged: list[tuple[int, str]] = []
    for nn, op in ops:
        if merged and merged[-1][1] == op:
            merged[-1] = (merged[-1][0] + nn, op)
        else:
            merged.append((nn, op))
    wmin, wmax = int(w.min()), int(w.max())
    if strand == 0:
        clip_l = wmin * WINDOW
        clip_r = max(L - (wmax + 1) * WINDOW, 0)
    else:
        # rc record: the read tail maps at the smallest genome coordinate
        clip_l = max(L - (wmax + 1) * WINDOW, 0)
        clip_r = wmin * WINDOW
    # read bases consumed by ops must equal L - clips: pad the last M for
    # the read tail that falls inside the final partial window
    consumed = sum(nn for nn, op in merged if op in "MI")
    want = L - clip_l - clip_r
    if want > consumed:
        # extend the tail-side M into the partial window
        if merged[-1][1] == "M":
            merged[-1] = (merged[-1][0] + (want - consumed), "M")
        else:
            merged.append((want - consumed, "M"))
    elif want < consumed:
        # trim from the tail M
        nn, op = merged[-1]
        merged[-1] = (max(nn - (consumed - want), 1), op)
    return clip_l, merged, clip_r, int(g[0])


def chain_read(
    res: dict, rows: np.ndarray, wins: np.ndarray, L: int, min_windows: int
) -> LongReadHit:
    """Chain the mapped windows (batch rows `rows`, window ids `wins`) of
    one read into the best diagonal cluster."""
    best = LongReadHit(mapped=False)
    mapped = np.asarray(res["mapped"], bool)[rows]
    if not mapped.any():
        return best
    pos = res["pos"].astype(np.int64)[rows]
    strand = np.asarray(res["strand"])[rows]
    votes = np.asarray(res["votes"])[rows]
    for st in (0, 1):
        sel = mapped & (strand == st)
        if not sel.any():
            continue
        w = wins[sel]
        p = pos[sel]
        v = votes[sel]
        d = p - w * WINDOW if st == 0 else p + w * WINDOW
        order = np.argsort(d)
        darr, warr, parr, varr = d[order], w[order], p[order], v[order]
        i, n = 0, len(darr)
        while i < n:
            j = i
            while j < n and darr[j] - darr[i] <= CHAIN_TOL:
                j += 1
            members = np.arange(i, j)
            # one block per distinct window (best-vote member wins)
            uw = {}
            for m in members:
                k = int(warr[m])
                if k not in uw or varr[m] > varr[uw[k]]:
                    uw[k] = m
            n_windows = len(uw)
            vsum = int(varr[members].sum())
            if n_windows >= min_windows and (
                not best.mapped or n_windows > best.n_windows
                or (n_windows == best.n_windows and vsum > best.votes)
            ):
                midx = np.asarray(sorted(uw.values()))
                cl, ops, cr, gpos0 = _chain_to_cigar(
                    warr[midx], parr[midx], L, st
                )
                span = sum(nn for nn, op in ops if op in "MDN")
                best = LongReadHit(
                    mapped=True, pos=gpos0, strand=st,
                    clip_left=cl, clip_right=cr, cigar_ops=ops,
                    span=span, n_windows=n_windows, votes=vsum,
                )
            i = j
    return best


def map_long_read(aligner, seq_codes: np.ndarray, min_windows: int = 2) -> LongReadHit:
    """Map one long read (uint8 codes) with the window/chain scheme."""
    hits = map_long_reads(aligner, [seq_codes], min_windows=min_windows)
    return hits[0]


def map_long_reads(
    aligner, reads: list[np.ndarray], min_windows: int = 2
) -> list[LongReadHit]:
    """Map many long reads in one device batch of 100bp windows."""
    names, seqs, owner, winid = [], [], [], []
    for r, codes in enumerate(reads):
        n_win = max(len(codes) // WINDOW, 1)
        for w in range(n_win):
            chunk = codes[w * WINDOW : (w + 1) * WINDOW]
            seqs.append(dna.decode(chunk).encode())
            names.append(f"r{r}w{w}")
            owner.append(r)
            winid.append(w)
    batch = batch_from_records(
        names, seqs, [b"I" * len(s) for s in seqs],
        pad_to=aligner.cfg.pad_read_len,
    )
    res = aligner.align_batch(batch)
    owner = np.asarray(owner)
    winid = np.asarray(winid)
    out = []
    for r, codes in enumerate(reads):
        rows = np.flatnonzero(owner == r)
        out.append(
            chain_read(res, rows, winid[rows], len(codes), min_windows)
        )
    return out


def map_long_reads_sharded(
    aligner, reads: list[np.ndarray], mesh, min_windows: int = 2
) -> list[LongReadHit]:
    """Sequence-parallel long-read mapping over a device mesh.

    The TPU answer to the reference's 1.2Mbp single-thread chaining loop
    (longread-mapping.c:529-660) and SURVEY §5's long-context scaling item:
    a long read's fixed 100bp windows ARE batch rows here, so sharding the
    reads axis of the window batch across the mesh splits ONE extreme read
    across all chips (window voting is embarrassingly parallel; only the
    host-side diagonal chaining sees the whole read).  No ring pass is
    needed because chaining consumes only (pos, strand, votes) per window —
    a few bytes, fetched once — not the window activations.
    """
    import jax

    from ..parallel.mesh import sharded_align_step

    names, seqs, owner, winid = [], [], [], []
    for r, codes in enumerate(reads):
        n_win = max(len(codes) // WINDOW, 1)
        for w in range(n_win):
            chunk = codes[w * WINDOW : (w + 1) * WINDOW]
            seqs.append(dna.decode(chunk).encode())
            names.append(f"r{r}w{w}")
            owner.append(r)
            winid.append(w)
    batch = batch_from_records(
        names, seqs, [b"I" * len(s) for s in seqs],
        pad_to=aligner.cfg.pad_read_len,
    )
    n = len(batch)
    S = mesh.devices.size
    n_pad = -(-n // S) * S
    codes_p = np.zeros((n_pad, batch.max_len), np.uint8)
    ambig_p = np.zeros((n_pad, batch.max_len), bool)
    lens_p = np.zeros(n_pad, np.int32)
    codes_p[:n] = batch.codes
    ambig_p[:n] = batch.ambig
    lens_p[:n] = batch.lengths
    step = sharded_align_step(mesh, aligner)
    res_dev = step(codes_p, ambig_p, lens_p)
    # np.array: rescue below writes records in place (device_get arrays
    # are read-only views)
    res = {k: np.array(jax.device_get(v))[:n] for k, v in res_dev.items()}
    # same wide-gather re-vote the single-chip align_batch applies to
    # saturated repeat windows — keeps mesh results bit-identical to it
    aligner._rescue_saturated(batch, res)
    owner = np.asarray(owner)
    winid = np.asarray(winid)
    return [
        chain_read(
            res, np.flatnonzero(owner == r), winid[np.flatnonzero(owner == r)],
            len(codes), min_windows,
        )
        for r, codes in enumerate(reads)
    ]


def sublong_file(aligner, fastq_path: str, out_sam: str, min_windows: int = 2,
                 sam_output: bool = False):
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
        sam_output=sam_output or out_sam.endswith(".sam"),
    )
    mapped = total = 0
    # chunk reads so one device batch holds ~batch_reads windows
    per_chunk_windows = max(aligner.cfg.batch_reads, 256)
    pend_names, pend_codes, pend_quals = [], [], []
    pend_win = 0

    def flush():
        nonlocal mapped, total, pend_win
        if not pend_codes:
            return
        hits = map_long_reads(aligner, pend_codes, min_windows=min_windows)
        for name, codes, qual_s, hit in zip(
            pend_names, pend_codes, pend_quals, hits
        ):
            seq_s = dna.decode(codes)
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
            cigar = ""
            if hit.clip_left:
                cigar += f"{hit.clip_left}S"
            cigar += "".join(f"{n}{op}" for n, op in hit.cigar_ops)
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
        pend_names.clear()
        pend_codes.clear()
        pend_quals.clear()
        pend_win = 0

    with opener(fastq_path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                break
            seq = f.readline().strip()
            f.readline()
            qual = f.readline().strip()
            total += 1
            pend_names.append(hdr[1:].split()[0].decode())
            pend_codes.append(dna.encode(seq))
            pend_quals.append(qual.decode())
            pend_win += max(len(seq) // WINDOW, 1)
            if pend_win >= per_chunk_windows:
                flush()
    flush()
    writer.close()
    return mapped, total
