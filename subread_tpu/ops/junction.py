"""Exon-exon junction detection (subjunc).

Reference: core-junction.c — major/minor vote-pair selection
(core_select_best_matching_halves :4900, process_voting_junction_PE_topK
:2199), split-point refinement with donor-site check (GT…AG fwd /
CT…AC rev, paired_chars_part_core :3472, donor_score :3675), junction
event edges (find_new_junctions :3865).

TPU formulation: the read's top-K vote clusters already exist; a junction
candidate is (head cluster, tail cluster) on the same strand within the
max intron span.  The optimal split point is the same prefix/suffix
mismatch-cumsum scan as the indel placement (ops/extend.py) with the
genome offset D = tail_pos - head_pos, restricted to splits whose flanking
genome dinucleotides match a canonical donor/acceptor motif.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .extend import genome_base, genome_window

MAX_INTRON = 500_000  # core.h:218 default maximum intron length
# base codes (A=0,G=1,C=2,T=3): GT..AG fwd donor, CT..AC rev donor
G, T, A, C = 1, 3, 0, 2


def junction_split_scan(
    genome_u32: jnp.ndarray,
    oriented: jnp.ndarray,   # [R, L] read codes in genome orientation
    read_len: jnp.ndarray,   # [R]
    head_pos: jnp.ndarray,   # [R] uint32 alignment start of the head cluster
    gap: jnp.ndarray,        # [R] int32 D = tail_pos - head_pos (>0)
    valid: jnp.ndarray,      # [R] bool candidate pair exists
):
    """Choose the junction split s (read coordinate) minimising mismatches,
    requiring a canonical donor/acceptor motif.

    Returns dict(split, mism, donor_strand, ok); donor_strand 0 = GT..AG,
    1 = CT..AC (the BED strand column).
    """
    R, L = oriented.shape
    ar = np.arange(L, dtype=np.int32)[None, :]
    inside = ar < read_len[:, None]

    # head/tail genome base grids via the packed-word window fetch
    # (ceil(L/16)+1 gathered words per row instead of L scalar gathers)
    win_h = genome_window(genome_u32, head_pos, L + 2)
    win_t = genome_window(
        genome_u32,
        head_pos.astype(jnp.uint32) + gap.astype(jnp.uint32) - np.uint32(2),
        L + 2,
    )
    mm_h = (win_h[:, :L] != oriented.astype(jnp.uint32)) & inside
    prefix = jnp.cumsum(
        jnp.pad(mm_h.astype(jnp.int32), ((0, 0), (1, 0))), axis=1
    )  # [R, L+1] mism in read[0:s]

    mm_t = (win_t[:, 2 : L + 2] != oriented.astype(jnp.uint32)) & inside
    rev = jnp.flip(mm_t.astype(jnp.int32), axis=1)
    suffix = jnp.flip(jnp.cumsum(rev, axis=1), axis=1)
    suffix = jnp.concatenate([suffix, jnp.zeros((R, 1), jnp.int32)], axis=1)

    total = prefix + suffix  # [R, L+1] mismatches if split at s

    # donor/acceptor motifs at each split: fwd GT at head_pos+s, AG ending
    # at head_pos+D+s-1; rev CT / AC.  All read from the two windows:
    # d1,d2 = win_h[s], win_h[s+1]; a1,a2 = win_t[s], win_t[s+1]
    # (win_t starts at head_pos+D-2, so win_t[s] = genome[head_pos+D+s-2]).
    d1 = win_h[:, 0 : L + 1]
    d2 = win_h[:, 1 : L + 2]
    a1 = win_t[:, 0 : L + 1]
    a2 = win_t[:, 1 : L + 2]
    donor_fwd = (d1 == G) & (d2 == T) & (a1 == A) & (a2 == G)
    donor_rev = (d1 == C) & (d2 == T) & (a1 == A) & (a2 == C)

    s_grid = np.arange(L + 1, dtype=np.int32)[None, :]
    in_range = (s_grid >= 8) & (s_grid <= read_len[:, None] - 8)
    big = jnp.int32(1 << 20)
    tf = jnp.where(in_range & donor_fwd & valid[:, None], total, big)
    tr = jnp.where(in_range & donor_rev & valid[:, None], total, big)

    sf = jnp.argmin(tf, axis=1).astype(jnp.int32)
    mf = jnp.take_along_axis(tf, sf[:, None], axis=1)[:, 0]
    sr = jnp.argmin(tr, axis=1).astype(jnp.int32)
    mr = jnp.take_along_axis(tr, sr[:, None], axis=1)[:, 0]

    use_rev = mr < mf
    split = jnp.where(use_rev, sr, sf)
    mism = jnp.where(use_rev, mr, mf)
    ok = mism < big

    # soft-clip noisy read ends of the junction explanation (the
    # reference emits e.g. 16M168N71M14S: find_soft_clipping applies to
    # explained reads too).  The combined mismatch vector stitches the
    # head half (< split) with the tail half (>= split); clips may not
    # consume an exon side below 8 bases (the split in_range floor).
    from .extend import softclip_bounds

    mm_comb = jnp.where(ar < split[:, None], mm_h, mm_t)
    cl, cr = softclip_bounds(mm_comb, read_len)
    cl = jnp.minimum(cl, jnp.maximum(split - 8, 0))
    cr = jnp.minimum(cr, jnp.maximum(read_len - split - 8, 0))
    no_clip = (cl + cr >= read_len - 16) | ~ok
    cl = jnp.where(no_clip, 0, cl)
    cr = jnp.where(no_clip, 0, cr)
    pc = jnp.cumsum(mm_comb.astype(jnp.int32), axis=1)
    head_mm = jnp.where(cl > 0, jnp.take_along_axis(
        pc, jnp.maximum(cl - 1, 0)[:, None], axis=1)[:, 0], 0)
    last_keep = jnp.clip(read_len - cr - 1, 0, L - 1)
    upto = jnp.take_along_axis(pc, last_keep[:, None], axis=1)[:, 0]
    mism_clipped = jnp.where(ok, jnp.maximum(upto - head_mm, 0), mism)

    return dict(
        split=split,
        mism=mism_clipped,
        clip_l=cl,
        clip_r=cr,
        donor_strand=use_rev.astype(jnp.int32),
        ok=ok,
    )


def pick_junction_pair(v, sc, max_indel: int, best=None, read_len=None):
    """From top-K clusters pick (head, tail) = best + best-compatible-minor.

    Returns per-read head_pos, gap D, pair_valid, head_k, tail_k.
    Compatibility: same strand, gap in (max_indel, MAX_INTRON], minor votes
    >= 1 (subjunc min-votes), coverage order consistent with genome order.
    `best` overrides the major cluster choice (the PE path passes the
    pair-selected candidate instead of the SE argmax)."""
    R, K = v.votes.shape
    if best is None:
        best = jnp.argmax(sc["score_k"], axis=1)  # major cluster index
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    b_pos = take(v.pos).astype(jnp.int64)
    b_strand = take(v.strand)
    b_cov_start = take(v.cov_start)
    b_valid = take(sc["valid_k"])

    # candidate minors: all k; score compatibility
    pos_k = v.pos.astype(jnp.int64)
    same_strand = v.strand == b_strand[:, None]
    diff = pos_k - b_pos[:, None]
    not_self = jnp.arange(K)[None, :] != best[:, None]
    # genome order must match read-coverage order
    minor_is_tail = v.cov_start > b_cov_start[:, None]
    expected_sign = jnp.where(minor_is_tail, 1, -1)
    gap_abs = jnp.abs(diff)
    # a junction minor explains the OTHER part of the read: its coverage
    # must not overlap the major's span (core_select_best_matching_halves
    # pairs complementary halves; without this, repeat copies covering
    # the SAME span hijack the minor slot and the true minor is never
    # tried)
    b_cov_end = take(v.cov_end)
    non_overlap = (
        (v.cov_start >= b_cov_end[:, None] - 8)
        | (v.cov_end <= b_cov_start[:, None] + 8)
    )
    ok = (
        same_strand & not_self & (v.votes >= 1) & non_overlap
        & (gap_abs > max_indel) & (gap_abs <= MAX_INTRON)
        & (jnp.sign(diff) == expected_sign)
        & (v.pos != jnp.asarray(np.uint32(0xFFFFFFFF)))
    )
    # minor choice: most votes, ties broken by PROXIMITY — repeat copies
    # of the true flanking exon otherwise win long spurious introns
    # (the reference scores halves by support then distance,
    # core_select_best_matching_halves :4900)
    # int32-safe fused score (jax x64 is disabled): gap <= MAX_INTRON
    # (500k) < 2^20, votes < 2^10, so votes*2^20 - gap fits comfortably
    minor_score = jnp.where(
        ok,
        v.votes.astype(jnp.int32) * jnp.int32(1 << 20)
        - gap_abs.astype(jnp.int32),
        jnp.int32(-1),
    )
    minor_k = jnp.argmax(minor_score, axis=1)
    best_minor_votes = jnp.take_along_axis(
        jnp.where(ok, v.votes, -1), minor_k[:, None], axis=1
    )[:, 0]
    minor_ok = best_minor_votes > 0
    m_pos = jnp.take_along_axis(pos_k, minor_k[:, None], axis=1)[:, 0]
    m_is_tail = jnp.take_along_axis(minor_is_tail, minor_k[:, None], axis=1)[:, 0]

    head_pos = jnp.where(m_is_tail, b_pos, m_pos)
    tail_pos = jnp.where(m_is_tail, m_pos, b_pos)
    gap = (tail_pos - head_pos).astype(jnp.int32)
    pair_valid = minor_ok & b_valid & (gap > 0)

    # big-margin ambiguity (is_ambiguous_voting core-junction.c:3522):
    # another DISTINCT location within 1 vote of the best whose coverage
    # span matches the best cluster's span (containment either way, +-4,
    # spans flipped to forward-read coordinates for reverse clusters).
    # Junction minors cover a DIFFERENT part of the read, so they never
    # trip this; repeat copies of the SAME span do.
    ambiguous = jnp.zeros_like(pair_valid)
    if read_len is not None:
        b_votes_all = take(v.votes)
        b_cov_end = take(v.cov_end)
        L = read_len[:, None]
        cs_f = jnp.where(v.strand == 1, L - v.cov_end, v.cov_start)
        ce_f = jnp.where(v.strand == 1, L - v.cov_start, v.cov_end)
        b_cs = jnp.where(b_strand == 1, read_len - b_cov_end, b_cov_start)
        b_ce = jnp.where(b_strand == 1, read_len - b_cov_start, b_cov_end)
        ge = v.votes >= b_votes_all[:, None]
        within = (cs_f >= b_cs[:, None] - 4) & (ce_f <= b_ce[:, None] + 4)
        contains = (cs_f <= b_cs[:, None] + 4) & (ce_f >= b_ce[:, None] - 4)
        same_span = jnp.where(ge, within, contains)
        distinct = pos_k != b_pos[:, None]
        n_amb = jnp.sum(
            (v.votes >= b_votes_all[:, None] - 1) & same_span & distinct
            & (v.pos != jnp.asarray(np.uint32(0xFFFFFFFF))),
            axis=1,
        )
        ambiguous = n_amb >= 1

    return dict(
        head_pos=head_pos.astype(jnp.uint32),
        gap=gap,
        valid=pair_valid,
        strand=b_strand,
        best_pos=b_pos,
        best_votes=take(v.votes),
        ambiguous=ambiguous,
    )


def big_margin_ambiguous(v, read_len):
    """Per-candidate `is_ambiguous_voting` with the reference's 3-slot
    big-margin record (core-junction.c:789 insert_big_margin_record,
    :3522 is_ambiguous_voting; big_margin_record_size=9 -> 3 records).

    The reference inserts every top-tier vote location in vote-table scan
    order, placing an equal-vote newcomer BEFORE existing records, so with
    capacity 3 the kept set is the top-3 clusters by (votes, recency).  A
    junction read tied across two repeat copies (2 copies x 2 half-spans =
    4 tied clusters) therefore keeps one half-span as a singleton record,
    whose result sees encounter==1 -> NOT ambiguous.  This is how the
    reference still seeds junction events inside segmental duplications
    while suppressing ordinary repeat reads (encounter>1).

    Returns [R, K] bool: True = candidate k is voting-ambiguous.
    """
    R, K = v.votes.shape
    SEN = jnp.asarray(np.uint32(0xFFFFFFFF))
    alive = v.pos != SEN
    votes = jnp.where(alive, v.votes.astype(jnp.int32), -1)
    # forward-read coordinate spans (is_ambiguous_voting flips negative)
    L = read_len[:, None]
    cs_f = jnp.where(v.strand == 1, L - v.cov_end, v.cov_start)
    ce_f = jnp.where(v.strand == 1, L - v.cov_start, v.cov_end)

    # kept records = top-3 by (votes, recency): equal-vote inserts displace
    # earlier ones, so higher k wins among ties
    karr = np.arange(K, dtype=np.int32)[None, :]
    keep_key = votes * K + karr
    order = jnp.argsort(-keep_key, axis=1)[:, :3]          # [R, 3]
    rv = jnp.take_along_axis(votes, order, axis=1)         # [R, 3]
    rcs = jnp.take_along_axis(cs_f, order, axis=1)
    rce = jnp.take_along_axis(ce_f, order, axis=1)

    # encounter: records with votes >= cand-1 and directional span match +-4
    vk = votes[:, :, None]                                 # [R, K, 1]
    vj = rv[:, None, :]                                    # [R, 1, 3]
    csk, cek = cs_f[:, :, None], ce_f[:, :, None]
    csj, cej = rcs[:, None, :], rce[:, None, :]
    inside = (csj >= csk - 4) & (cej <= cek + 4)
    contains = (csj <= csk + 4) & (cej >= cek - 4)
    span_match = jnp.where(vk >= vj, inside, contains)
    enc = jnp.sum(
        (vj >= vk - 1) & (vj > 0) & span_match, axis=2
    )
    return (enc > 1) & alive


def pick_seed_junction(v, sc, max_indel: int, read_len, cand_ok):
    """Junction event seeding: the reference calls find_new_junctions once
    per stored candidate result (core-junction.c:3836), gated per-result by
    the 3-slot is_ambiguous_voting; the first candidate that passes the
    gate AND has a compatible minor half seeds a junction event — even
    when the read's own final alignment ends up elsewhere (scan 2 decides
    per-read against the event table).

    Returns dict(head_pos, gap, valid, strand, disc_k) for the seeding
    (major, minor) pair per read."""
    R, K = v.votes.shape
    amb = big_margin_ambiguous(v, read_len)
    SEN = jnp.asarray(np.uint32(0xFFFFFFFF))
    alive = v.pos != SEN

    # pairwise minor compatibility: [R, Kmajor, Kminor]
    pos = v.pos.astype(jnp.int64)
    same_strand = v.strand[:, :, None] == v.strand[:, None, :]
    diff = pos[:, None, :] - pos[:, :, None]               # minor - major
    not_self = ~jnp.eye(K, dtype=bool)[None]
    minor_is_tail = v.cov_start[:, None, :] > v.cov_start[:, :, None]
    expected_sign = jnp.where(minor_is_tail, 1, -1)
    gap_abs = jnp.abs(diff)
    non_overlap = (
        (v.cov_start[:, None, :] >= v.cov_end[:, :, None] - 8)
        | (v.cov_end[:, None, :] <= v.cov_start[:, :, None] + 8)
    )
    ok = (
        same_strand & not_self & (v.votes[:, None, :] >= 1) & non_overlap
        & (gap_abs > max_indel) & (gap_abs <= MAX_INTRON)
        & (jnp.sign(diff) == expected_sign)
        & alive[:, None, :] & alive[:, :, None]
    )
    pairable = jnp.any(ok, axis=2)                          # [R, K]

    seedable = cand_ok & ~amb & pairable

    def one_seed(seedable_k):
        disc_k = jnp.argmax(seedable_k, axis=1).astype(jnp.int32)  # first True
        found = jnp.any(seedable_k, axis=1)
        take_m = lambda a: jnp.take_along_axis(a, disc_k[:, None], axis=1)[:, 0]
        d_pos = take_m(pos)
        d_strand = take_m(v.strand)
        # minor for the seeding major: most votes, proximity tie-break
        ok_d = jnp.take_along_axis(ok, disc_k[:, None, None], axis=1)[:, 0]
        gap_d = jnp.take_along_axis(gap_abs, disc_k[:, None, None], axis=1)[:, 0]
        minor_score = jnp.where(
            ok_d,
            v.votes.astype(jnp.int32) * jnp.int32(1 << 20)
            - gap_d.astype(jnp.int32),
            jnp.int32(-1),
        )
        minor_k = jnp.argmax(minor_score, axis=1)
        take_n = lambda a: jnp.take_along_axis(a, minor_k[:, None], axis=1)[:, 0]
        m_pos = take_n(pos)
        m_is_tail = m_pos > d_pos
        head_pos = jnp.where(m_is_tail, d_pos, m_pos)
        tail_pos = jnp.where(m_is_tail, m_pos, d_pos)
        gap = (tail_pos - head_pos).astype(jnp.int32)
        return dict(
            head_pos=head_pos.astype(jnp.uint32),
            gap=gap,
            valid=found & (gap > 0),
            strand=d_strand,
            disc_k=disc_k,
        ), disc_k, d_pos

    first, disc1, d_pos1 = one_seed(seedable)
    # second seed: the next seedable candidate at a DIFFERENT position —
    # inside a duplication both copies pass the 3-slot gate and the copy
    # with the intact donor motif may not come first (find_new_junctions
    # runs per stored result, so the reference tries each in turn)
    seedable2 = seedable & (pos != d_pos1[:, None]) & (
        np.arange(K, dtype=np.int32)[None, :] != disc1[:, None]
    )
    second, _, _ = one_seed(seedable2)
    first["head_pos2"] = second["head_pos"]
    first["gap2"] = second["gap"]
    first["valid2"] = second["valid"]
    first["strand2"] = second["strand"]
    return first


def junction_rescue(
    genome_u32: jnp.ndarray,
    oriented: jnp.ndarray,    # [R, L] read codes in genome orientation
    read_len: jnp.ndarray,    # [R]
    pos: jnp.ndarray,         # [R] uint32 anchor alignment start
    ev_left: jnp.ndarray,     # [E] uint32 sorted junction left edges (linear)
    ev_right: jnp.ndarray,    # [E] uint32 matching right edges
    n_cand: int = 4,
):
    """Re-explain reads against the global junction event table.

    Reference: explain_read / search_events_to_back-front
    (core-junction.c:2617, :125, :588) — scan 2 walks the event space
    around each read's anchor so reads WITHOUT their own minor vote
    cluster still get junction CIGARs, and junction support counts include
    them.  Here: the n_cand events whose left edge falls inside the read
    span are tested with the fixed-split mismatch scan; the best
    (fewest-mismatch) event wins.

    Returns dict(mism, split, gap, ok) for the best event per read.
    """
    R, L = oriented.shape
    E = ev_left.shape[0]
    ar = np.arange(L, dtype=np.int32)[None, :]
    inside = ar < read_len[:, None]

    # head mismatch prefix (read i vs genome pos+i)
    win_h = genome_window(genome_u32, pos, L)
    mm_h = (win_h != oriented.astype(jnp.uint32)) & inside
    prefix = jnp.cumsum(
        jnp.pad(mm_h.astype(jnp.int32), ((0, 0), (1, 0))), axis=1
    )  # [R, L+1]

    # candidate events: left edge in [pos+7, pos+len-8]
    first = jnp.searchsorted(ev_left, pos + np.uint32(7))  # [R]
    cidx = jnp.minimum(first[:, None] + np.arange(n_cand, dtype=np.int32), E - 1)
    c_left = ev_left[cidx]    # [R, n_cand]
    c_right = ev_right[cidx]
    split = (c_left - pos[:, None] + np.uint32(1)).astype(jnp.int32)  # [R, C]
    gap = (c_right - c_left - np.uint32(1)).astype(jnp.int32)
    valid = (
        (split >= 8)
        & (split <= read_len[:, None] - 8)
        & (gap > 0)
        & (cidx < E)
    )

    # fused ranking: mismatches first, PROXIMITY as tie-break (identical
    # repeat copies of a flanking exon otherwise win longer introns);
    # mism*2^20 + gap fits int32 (gap <= MAX_INTRON < 2^20)
    BIG = jnp.int32(1 << 30)
    best_score = jnp.full((R,), 1 << 30, jnp.int32)
    best_mism = jnp.full((R,), 1 << 20, jnp.int32)
    best_split = jnp.zeros((R,), jnp.int32)
    best_gap = jnp.zeros((R,), jnp.int32)
    best_pos = pos
    for c in range(n_cand):
        # tail mismatches under genome offset gap_c: read i vs pos+i+gap
        g_tail = genome_window(
            genome_u32, pos + gap[:, c].astype(jnp.uint32), L
        )
        mm_t = (g_tail != oriented.astype(jnp.uint32)) & inside
        rev = jnp.flip(mm_t.astype(jnp.int32), axis=1)
        suffix = jnp.flip(jnp.cumsum(rev, axis=1), axis=1)  # [R, L]
        suffix = jnp.concatenate(
            [suffix, jnp.zeros((R, 1), jnp.int32)], axis=1
        )
        s_c = jnp.clip(split[:, c], 0, L)
        m = jnp.take_along_axis(prefix, s_c[:, None], axis=1)[:, 0] + \
            jnp.take_along_axis(suffix, s_c[:, None], axis=1)[:, 0]
        score = jnp.where(valid[:, c], m * (1 << 20) + gap[:, c], BIG)
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_mism = jnp.where(better & valid[:, c], m, best_mism)
        best_split = jnp.where(better, split[:, c], best_split)
        best_gap = jnp.where(better, gap[:, c], best_gap)

    # mirrored arm (search_events_to_front): the read anchors the RIGHT
    # exon; a table junction whose right edge falls inside the read span
    # explains the prefix as the LEFT exon's tail.  The anchor moves to
    # le - split + 1.
    r_order = jnp.argsort(ev_right)
    evr_sorted = ev_right[r_order]
    evl_sorted = ev_left[r_order]
    first_r = jnp.searchsorted(evr_sorted, pos + np.uint32(8))
    cidx_r = jnp.minimum(
        first_r[:, None] + np.arange(n_cand, dtype=np.int32), E - 1
    )
    cr_right = evr_sorted[cidx_r]   # [R, C]
    cr_left = evl_sorted[cidx_r]
    split_r = (cr_right - pos[:, None]).astype(jnp.int32)
    gap_r = (cr_right - cr_left - np.uint32(1)).astype(jnp.int32)
    valid_r = (
        (split_r >= 8)
        & (split_r <= read_len[:, None] - 8)
        & (gap_r > 0)
        & (cidx_r < E)
    )
    # suffix mismatches of the CURRENT (right-exon) alignment
    rev_h = jnp.flip(mm_h.astype(jnp.int32), axis=1)
    suffix_h = jnp.flip(jnp.cumsum(rev_h, axis=1), axis=1)
    suffix_h = jnp.concatenate(
        [suffix_h, jnp.zeros((R, 1), jnp.int32)], axis=1
    )
    for c in range(n_cand):
        new_start = (
            cr_left[:, c] - split_r[:, c].astype(jnp.uint32) + np.uint32(1)
        )
        g_head = genome_window(genome_u32, new_start, L)
        mm_p = (g_head != oriented.astype(jnp.uint32)) & inside
        pre2 = jnp.cumsum(
            jnp.pad(mm_p.astype(jnp.int32), ((0, 0), (1, 0))), axis=1
        )
        s_c = jnp.clip(split_r[:, c], 0, L)
        m = jnp.take_along_axis(pre2, s_c[:, None], axis=1)[:, 0] + \
            jnp.take_along_axis(suffix_h, s_c[:, None], axis=1)[:, 0]
        score = jnp.where(valid_r[:, c], m * (1 << 20) + gap_r[:, c], BIG)
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_mism = jnp.where(better & valid_r[:, c], m, best_mism)
        best_split = jnp.where(better, split_r[:, c], best_split)
        best_gap = jnp.where(better, gap_r[:, c], best_gap)
        best_pos = jnp.where(better, new_start, best_pos)

    return dict(
        mism=best_mism, split=best_split, gap=best_gap, pos=best_pos,
        ok=best_score < BIG,
    )
