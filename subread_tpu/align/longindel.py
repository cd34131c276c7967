"""Long-indel rescue: the aligner's third iteration.

Reference: indels longer than the banded-DP reach (16bp) cannot be placed
by realignment; the reference runs a reassembly iteration that re-anchors
the soft-clipped breakpoint tails against nearby genome
(do_iteration_three / finalise_long_insertions, core.c:3643-3648,
core-indel.c:4389; enabled when -I > 16, init_global_context
core-indel.c:4399+).

Here: after scan-2, a read straddling a long indel comes out anchored on
one side with a large soft-clip at the breakpoint (the clip gate keeps the
anchored half mapped).  For each such read the clipped tail/head is
re-anchored host-side with a vectorized mismatch scan over candidate
deletion lengths d ∈ (short_limit, max_indel] (tail matches genome
displaced by d) or insertion lengths k (tail minus its first k bases
matches in place).  Successful rescues rewrite the CIGAR
(…M dD …M / …M kI …M), fix the position for head-side rescues, and add
the event to the .indel.vcf table.  Flagged reads are rare, so this is
host wall-clock noise next to the device scans.
"""

from __future__ import annotations

import numpy as np

from .. import dna
from ..index.genome import Genome


def left_normalize_codes(gcodes: np.ndarray, pos0: int, ilen: int,
                         ins: np.ndarray | None):
    """Left-align an indel event over 2-bit genome codes: rotate the event
    left while the reference base before it equals its last base (the
    standard VCF normalization).  Re-anchored long indels otherwise land
    at rotation-ambiguous breakpoints — head-side and tail-side rescues of
    the SAME insertion produce shifted keys that would double-report.
    pos0 = small_side (0-based last reference base before the event);
    ilen > 0 deletion, < 0 insertion with `ins` codes.  Returns
    (pos0, ins)."""
    if ilen > 0:
        while pos0 >= 0 and gcodes[pos0] == gcodes[pos0 + ilen]:
            pos0 -= 1
    elif ins is not None and len(ins):
        ins = np.asarray(ins, np.uint8).copy()
        while pos0 >= 0 and gcodes[pos0] == ins[-1]:
            ins = np.concatenate([[gcodes[pos0]], ins[:-1]])
            pos0 -= 1
    return pos0, ins


def _best_match(windows: np.ndarray, tail: np.ndarray, max_mm: int) -> int:
    """Index of the window row best matching tail (fewest mismatches,
    ties to the smallest index) if within max_mm, else -1.
    windows [D, T], tail [T]."""
    if windows.size == 0:
        return -1
    mm = (windows != tail[None, :]).sum(axis=1)
    j = int(mm.argmin())
    return j if mm[j] <= max_mm else -1


def rescue_long_indels(
    genome: Genome,
    batch,
    res: dict,
    max_indel: int,
    short_limit: int = 16,
    min_clip: int = 12,
    max_mm_frac: float = 0.12,
) -> tuple[dict, dict, int]:
    """Re-anchor large soft-clips as long indels.

    Returns (overrides {i: (cigar, mism, nm)}, events
    {(cidx, pos0, ilen): (support, ins_seq)}, n_rescued).  Mutates
    res["pos"] for head-side rescues (the alignment start moves upstream).
    """
    if "clip_l" not in res or max_indel <= short_limit:
        return {}, {}, 0
    clip_l = np.asarray(res["clip_l"], np.int64)
    clip_r = np.asarray(res["clip_r"], np.int64)
    mapped = np.asarray(res["mapped"], bool)
    indel0 = np.asarray(res["indel"], np.int64)
    cand = mapped & (indel0 == 0) & (
        (clip_l >= min_clip) | (clip_r >= min_clip)
    )
    idxs = np.flatnonzero(cand)
    if len(idxs) == 0:
        return {}, {}, 0

    gcodes = genome.codes
    G = len(gcodes)
    pos = np.asarray(res["pos"], np.int64)
    strand = np.asarray(res["strand"], np.int64)
    mism = np.asarray(res["mism"], np.int64)
    overrides: dict[int, tuple[str, int, int]] = {}
    events: dict[tuple[int, int, int], tuple[int, str]] = {}
    new_pos = pos.copy()
    d_lo = short_limit + 1

    def add_event(lin_pos0: int, ilen: int, ins: str):
        ins_codes = dna.encode(ins) if ins else None
        lin_pos0, ins_codes = left_normalize_codes(
            gcodes, int(lin_pos0), ilen, ins_codes
        )
        ins = dna.decode(ins_codes) if ins_codes is not None else ""
        cidx, coff = genome.linear_to_chro(np.array([lin_pos0], np.int64))
        key = (int(cidx[0]), int(coff[0]), ilen)
        sup, prev = events.get(key, (0, ins))
        events[key] = (sup + 1, prev)

    for i in idxs:
        L = int(batch.lengths[i])
        oc = batch.codes[i, :L]
        if strand[i] == 1:
            oc = dna.revcomp(oc)
        cl, cr = int(clip_l[i]), int(clip_r[i])
        m = L - cl - cr  # matched span of the anchored half
        p = int(pos[i])  # linear genome pos of the first matched base

        if cr >= min_clip:
            tail = oc[L - cr :]
            q0 = p + m  # breakpoint: genome pos right after the match
            max_mm = int(max_mm_frac * cr)
            # deletion of d: tail re-anchors at q0 + d
            lo, hi = q0 + d_lo, min(q0 + max_indel + cr, G)
            if hi - lo >= cr:
                win = np.lib.stride_tricks.sliding_window_view(
                    gcodes[lo:hi], cr
                )
                j = _best_match(win, tail, max_mm)
            else:
                j = -1
            if j >= 0:
                d = d_lo + j
                mm = mism[i] + int((win[j] != tail).sum())
                cig = (f"{cl}S" if cl else "") + f"{m}M{d}D{cr}M"
                overrides[i] = (cig, int(mm), int(mm + d))
                add_event(q0 - 1, d, "")
                continue
            # insertion of k: tail[k:] re-anchors at q0; take the k with
            # the lowest mismatch fraction (first-acceptable can stop a
            # few bases short of the true insertion length)
            best_k, best_mm, best_frac = -1, 0, 1.0
            for k in range(d_lo, min(cr - 10, max_indel) + 1):
                t2 = tail[k:]
                if q0 + len(t2) > G:
                    break
                mmk = int((gcodes[q0 : q0 + len(t2)] != t2).sum())
                frac = mmk / len(t2)
                if frac <= max_mm_frac and frac < best_frac:
                    best_k, best_mm, best_frac = k, mmk, frac
            if best_k >= 0:
                k, mm = best_k, mism[i] + best_mm
                cig = (f"{cl}S" if cl else "") + f"{m}M{k}I{cr - k}M"
                overrides[i] = (cig, int(mm), int(mm + k))
                add_event(q0 - 1, -k, dna.decode(tail[:k]))
                continue

        if cl >= min_clip:
            head = oc[:cl]
            max_mm = int(max_mm_frac * cl)
            # deletion of d: head anchors at p - d - cl
            ds = np.arange(d_lo, max_indel + 1)
            starts = p - ds - cl
            ds = ds[starts >= 0]
            if len(ds):
                lo = int(p - ds[-1] - cl)
                hi = int(p - ds[0])  # head windows end before p - d
                win_all = np.lib.stride_tricks.sliding_window_view(
                    gcodes[lo:hi], cl
                )
                # window for deletion d starts at (p - d - cl) - lo
                sel = (p - ds - cl) - lo
                win = win_all[sel]
                j = _best_match(win, head, max_mm)
            else:
                j = -1
            if j >= 0:
                d = int(ds[j])
                mm = mism[i] + int((win[j] != head).sum())
                cig = f"{cl}M{d}D{m}M" + (f"{cr}S" if cr else "")
                overrides[i] = (cig, int(mm), int(mm + d))
                new_pos[i] = p - d - cl
                add_event(p - d - 1, d, "")
                continue
            # insertion of k: head[:cl-k] anchors at p - (cl - k); best k
            # by mismatch fraction (see tail-side note)
            best = None
            for k in range(d_lo, min(cl - 10, max_indel) + 1):
                h2 = head[: cl - k]
                q = p - len(h2)
                if q < 0:
                    continue
                mmk = int((gcodes[q : q + len(h2)] != h2).sum())
                frac = mmk / len(h2)
                if frac <= max_mm_frac and (best is None or frac < best[0]):
                    best = (frac, k, mmk, q)
            if best is not None:
                _, k, mmk, q = best
                mm = mism[i] + mmk
                cig = f"{cl - k}M{k}I{m}M" + (f"{cr}S" if cr else "")
                overrides[i] = (cig, int(mm), int(mm + k))
                new_pos[i] = q
                add_event(p - 1, -k, dna.decode(head[cl - k : cl]))

    if overrides:
        res["pos"] = new_pos.astype(res["pos"].dtype)
    return overrides, events, len(overrides)
