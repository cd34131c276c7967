"""Exact reference vote semantics for parity-sensitive reads.

The device vote kernel (ops/vote.py) counts cluster votes with a
fixed-width one-sided window over a per-probe hit cap H — faithful for
unique regions, but in repeats it can over/under-count by a vote or two
vs the reference's anchored clustering (gehash_go_X,
sorted-hashtable.c:937-1060), which shifts the top-3 vote tiers and with
them the anchor count (MAPQ denominator), the break-even set, and
occasionally the winning position.

This module re-votes the small flagged subset on the host with the
reference's exact rules:

  - hits = all index positions of each probe 16-mer (no cap; the
    uninformative >100 filter already applied at build),
  - a hit joins the FIRST existing same-strand cluster whose ANCHOR
    (first-arriving kv) is within +-tolerance, one vote per subread per
    cluster (last_subread guard),
  - vote-table scan order = row (kv/5 % 30) then insertion order
    (_index_vote_tol, sorted-hashtable.c:344),
  - the simple/anchor selection of process_voting_junction_PE_topK.

Reads are flagged when a competing candidate sits within the vote-count
error margin of the top tier boundary, or when any probe saturated the
device hit window.
"""

from __future__ import annotations

import numpy as np

from .. import dna
from .indelevent import ref_stats_host

SENTINEL = 0xFFFFFFFF
VOTE_ROWS = 30            # GENE_VOTE_TABLE_SIZE (subread.h:216)
INDEL_SEG = 5             # INDEL_SEGMENT_SIZE


def probe_offsets(L: int, total_subreads: int, gap: int = 1) -> np.ndarray:
    """core.c:3115-3184 subread extraction offsets."""
    step_fx = max(gap << 16, ((L - 15 - gap) << 16) // max(total_subreads - 1, 1))
    base = (np.arange(total_subreads) * step_fx) >> 16
    if gap > 1:
        base = (base[:, None] + np.arange(gap)[None, :]).ravel()
    return np.minimum(base, max(L - 16, 0)).astype(np.int64)


class Cluster:
    __slots__ = ("anchor", "strand", "votes", "last_probe", "row",
                 "members", "head", "tail", "cov_s", "cov_e")

    def __init__(self, kv, strand, probe, off):
        self.anchor = kv
        self.strand = strand
        self.votes = 1
        self.last_probe = probe
        self.row = (kv // INDEL_SEG) % VOTE_ROWS
        self.members = [(probe, kv, off)]
        self.head = kv
        self.tail = kv
        self.cov_s = off
        self.cov_e = off + 16

    def add(self, kv, probe, off):
        self.votes += 1
        self.last_probe = probe
        self.members.append((probe, kv, off))
        if off < self.cov_s:
            self.cov_s = off
            self.head = kv
        if off + 16 > self.cov_e:
            self.cov_e = off + 16
            self.tail = kv
    # note: head/tail track the kv of the min/max-offset member like the
    # device kernel (indel = tail - head)


def _lookup(index, key: int):
    """All positions of a 16-mer via the canonical sorted-key arrays;
    returns (positions ascending, orientation_flipped)."""
    rc = dna.revcomp_key(key) if hasattr(dna, "revcomp_key") else None
    if rc is None:
        # bit-reversal reverse complement of a 2-bit packed 16-mer
        x = np.uint32(key)
        x = ~x
        x = ((x & np.uint32(0x33333333)) << np.uint32(2)) | (
            (x >> np.uint32(2)) & np.uint32(0x33333333))
        x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
            (x >> np.uint32(4)) & np.uint32(0x0F0F0F0F))
        x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
            (x >> np.uint32(8)) & np.uint32(0x00FF00FF))
        x = (x << np.uint32(16)) | (x >> np.uint32(16))
        rc = int(x)
    canon = min(key, rc)
    flipped = canon != key
    lo = np.searchsorted(index.keys, np.uint32(canon), side="left")
    hi = np.searchsorted(index.keys, np.uint32(canon), side="right")
    return lo, hi, flipped


def reference_vote(index, genome_codes, read_codes: np.ndarray,
                   total_subreads: int, tol: int, gap: int = 1):
    """Reference-exact vote table for one read.  Returns clusters in
    vote-table scan order (row, then insertion order)."""
    L = len(read_codes)
    offs = probe_offsets(L, total_subreads, gap)
    clusters: list[Cluster] = []
    keys_arr = index.keys
    pos_arr = index.positions
    for strand in (0, 1):
        rc = (3 - read_codes)[::-1] if strand else read_codes
        for p, off in enumerate(offs):
            kmer = rc[off:off + 16]
            key = 0
            for b in kmer:
                key = (key << 2) | int(b)
            lo, hi, flipped = _lookup(index, key)
            if hi <= lo:
                continue
            hits = pos_arr[lo:hi]
            # orientation per hit: the stored kmer equals the probe kmer
            # (forward) or its revcomp; resolve by direct genome compare
            for hp in hits.tolist():
                fwd = bool(
                    np.array_equal(genome_codes[hp:hp + 16], kmer)
                )
                if not fwd:
                    continue
                kv = hp - int(off)
                placed = False
                for cl in clusters:
                    if cl.strand == strand and abs(kv - cl.anchor) <= tol:
                        if cl.last_probe != (strand, p):
                            cl.add(kv, (strand, p), int(off))
                        placed = True
                        break
                if not placed:
                    clusters.append(Cluster(kv, strand, (strand, p), int(off)))
    clusters.sort(key=lambda c: c.row)
    return clusters


def anchor_list(clusters, min_first: int, cutoff: int = 2,
                max_simples: int = 3, multi_best: int = 3):
    """process_voting_junction_PE_topK SE branch: top-3 distinct vote
    values within cutoff of max, simple list in table-scan order capped
    at max_simples, anchors dedup by position with votes >= min_first."""
    if not clusters:
        return [], 0
    vals = sorted({c.votes for c in clusters}, reverse=True)[:3]
    vmax = vals[0]
    simples = []
    for v in vals:
        if v < 1 or vmax - v > cutoff:
            break
        for c in clusters:
            if len(simples) >= max_simples:
                break
            if c.votes == v:
                simples.append(c)
        if len(simples) >= max_simples:
            break
    anchors = []
    seen = set()
    for c in simples:
        if c.votes < min_first:
            continue
        if c.head in seen:
            continue
        seen.add(c.head)
        anchors.append(c)
        if len(anchors) >= multi_best:
            break
    return anchors, len(anchors)


def flag_reads(res, index, batch, total_subreads: int, window_cap: int,
               gap: int = 1) -> np.ndarray:
    """Reads whose vote table may diverge from the reference:
    a competing candidate within (cutoff + 2) votes of the max, or any
    probe whose key occupies more index entries than the device window."""
    votes = np.asarray(res.get("votes"), np.int32)
    mapped = np.asarray(res["mapped"], bool)
    # competing candidate: multi flag or second candidate near the top —
    # the device exports only the winner, so use conservative proxies
    flags = np.zeros(len(votes), bool)
    if "n_anchors" in res:
        flags |= np.asarray(res["n_anchors"], np.int32) >= 2
    flags |= np.asarray(res["multi"], bool)
    # saturated probes: vectorized key-count check over the whole batch
    R = len(batch.lengths)
    # only uniform-length fast path; mixed lengths fall back to per-read
    counts_flag = np.zeros(R, bool)
    keys_all = []
    owners = []
    for i in range(R):
        L = int(batch.lengths[i])
        codes = batch.codes[i, :L].astype(np.int64)
        offs = probe_offsets(L, total_subreads, gap)
        k = np.zeros(len(offs), np.int64)
        for b in range(16):
            k = (k << 2) | codes[np.minimum(offs + b, L - 1)]
        keys_all.append(k)
        owners.append(np.full(len(offs), i))
    keys_all = np.concatenate(keys_all).astype(np.uint32)
    owners = np.concatenate(owners)
    canon = np.minimum(keys_all, dna.revcomp_keys(keys_all)) if hasattr(
        dna, "revcomp_keys") else None
    if canon is None:
        from ..index.build import revcomp_keys_np
        canon = np.minimum(keys_all, revcomp_keys_np(keys_all))
    lo = np.searchsorted(index.keys, canon, side="left")
    hi = np.searchsorted(index.keys, canon, side="right")
    big = (hi - lo) > window_cap
    np.logical_or.at(counts_flag, owners[big], True)
    flags |= counts_flag
    return flags & (mapped | (votes >= 1))


def apply_exact_votes(genome, index, batch, res, cfg,
                      flags: np.ndarray) -> int:
    """Re-vote flagged reads with reference semantics and rewrite the
    selection outputs (pos/strand/indel/split/mism/clips/mapq/mapped/
    multi/n_anchors).  Returns the number of reads changed."""
    from .indelevent import core_dynamic_align  # noqa: F401 (kept host path)

    tol = max(min(cfg.max_indel, 16), 1)
    gcodes = genome.codes
    changed = 0
    pos_arr = np.asarray(res["pos"], np.uint32).copy()
    strand_arr = np.asarray(res["strand"], np.int8).copy()
    indel_arr = np.asarray(res["indel"], np.int8).copy()
    split_arr = np.asarray(res["split"], np.int16).copy()
    mism_arr = np.asarray(res["mism"], np.int16).copy()
    cl_arr = np.asarray(res["clip_l"], np.int32).copy()
    cr_arr = np.asarray(res["clip_r"], np.int32).copy()
    mapq_arr = np.asarray(res["mapq"], np.int8).copy()
    mapped_arr = np.asarray(res["mapped"], bool).copy()
    multi_arr = np.asarray(res["multi"], bool).copy()
    nanch_arr = np.asarray(
        res.get("n_anchors", np.ones(len(pos_arr), np.int8)), np.int8
    ).copy()
    votes_arr = np.asarray(res["votes"], np.int8).copy()
    cov_s_arr = (np.asarray(res["cov_start"], np.int16).copy()
                 if "cov_start" in res else None)
    cov_e_arr = (np.asarray(res["cov_end"], np.int16).copy()
                 if "cov_end" in res else None)
    pkv = np.asarray(res["probe_kv"], np.uint32) if "probe_kv" in res else None

    for i in np.flatnonzero(flags):
        L = int(batch.lengths[i])
        codes = batch.codes[i, :L].astype(np.int64)
        clusters = reference_vote(index, gcodes, codes,
                                  cfg.total_subreads, tol)
        anchors, n_anch = anchor_list(clusters, cfg.min_votes)
        if not anchors:
            if mapped_arr[i]:
                mapped_arr[i] = False
                changed += 1
            continue
        # score every anchor with the reference's final stats
        best = None
        best_key = (-1, -1)
        n_eq = 0
        for c in anchors:
            vpos = c.head
            ind = int(np.clip(c.tail - c.head, -tol, tol))
            read = (3 - codes)[::-1] if c.strand else codes
            # optimal split for the cluster's net indel (min mismatches;
            # the indel-event pass refines placement afterwards)
            stats = _score_anchor(gcodes, read, L, vpos, ind,
                                  c.cov_s, c.cov_e, cfg)
            if stats is None:
                continue
            split, head, tail, mism, match = stats
            if mism > cfg.max_mismatches or match < 1:
                continue
            score = match * 100000 + (10000 - mism)
            key = (score, -anchors.index(c))
            sig = (vpos, c.strand, ind, split, head, tail)
            if score > best_key[0]:
                best_key = (score, 0)
                best = (c, split, head, tail, mism, match, sig)
                n_eq = 1
            elif score == best_key[0] and best is not None and sig != best[6]:
                n_eq += 1
        if best is None:
            if mapped_arr[i]:
                mapped_arr[i] = False
                changed += 1
            continue
        c, split, head, tail, mism, match, _sig = best
        breakeven = n_eq > 1
        mapq = 0 if breakeven else (
            cfg.mapq_unique // max(1, n_anch + mism)
        )
        new_mapped = not breakeven or cfg.report_multi_mapping
        ind = int(np.clip(c.tail - c.head, -tol, tol))
        pos_arr[i] = np.uint32(c.head + head)
        strand_arr[i] = c.strand
        indel_arr[i] = ind
        split_arr[i] = split
        mism_arr[i] = mism
        cl_arr[i] = head
        cr_arr[i] = tail
        mapq_arr[i] = mapq
        mapped_arr[i] = new_mapped
        multi_arr[i] = breakeven
        nanch_arr[i] = n_anch
        votes_arr[i] = min(c.votes, 127)
        if cov_s_arr is not None:
            cov_s_arr[i] = c.cov_s
            cov_e_arr[i] = c.cov_e
        if pkv is not None:
            # rebuild the per-probe section table for the indel-event pass
            row = np.full(pkv.shape[1], SENTINEL, np.uint32)
            for (st, p), kv, off in c.members:
                if p < len(row):
                    row[p] = np.uint32(kv)
            pkv[i] = row
        changed += 1
    res.update(pos=pos_arr, strand=strand_arr, indel=indel_arr,
               split=split_arr, mism=mism_arr, clip_l=cl_arr, clip_r=cr_arr,
               mapq=mapq_arr, mapped=mapped_arr, multi=multi_arr,
               n_anchors=nanch_arr, votes=votes_arr)
    if cov_s_arr is not None:
        res.update(cov_start=cov_s_arr, cov_end=cov_e_arr)
    if pkv is not None:
        res["probe_kv"] = pkv
    return changed


def _score_anchor(gcodes, read, L, vpos, ind, cov_s, cov_e, cfg):
    """Host mirror of the device scoring: min-mismatch single-indel split
    + reference clip/mismatch stats."""
    if vpos < 16 or vpos + L + abs(ind) + 16 >= len(gcodes):
        return None
    ins = max(0, -ind)
    g_head = gcodes[vpos:vpos + L]
    mm_head = read != g_head[:L]
    if ind == 0:
        split = L
        mm = mm_head
    else:
        g_tail = gcodes[vpos + ind:vpos + ind + L]
        mm_tail = read != g_tail[:L]
        ph = np.concatenate([[0], np.cumsum(mm_head)])
        st = np.concatenate([np.cumsum(mm_tail[::-1])[::-1], [0]])
        # suffix from s+ins
        tot = np.full(L + 1, 1 << 20, np.int64)
        for s in range(1, L - ins):
            tot[s] = ph[s] + st[min(s + ins, L)]
        split = int(np.argmin(tot))
        mm = np.zeros(L, bool)
        mm[:split] = mm_head[:split]
        mm[split + ins:] = mm_tail[split + ins:]
        if ins:
            mm[split:split + ins] = False
    splits = [] if ind == 0 else [split]
    inds = [] if ind == 0 else [ind]
    head, tail, mism, match = ref_stats_host(
        mm, None, L, splits, inds, int(cov_s), int(cov_e),
        show_clip=cfg.show_soft_clipping,
    )
    return split, head, tail, mism, match
