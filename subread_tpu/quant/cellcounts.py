"""cellCounts: single-cell RNA-seq counting pipeline.

Reference: cell-counts.c — barcode matching with hamming≤1 rescue
(:1713, input-blc.h:52), seed-and-vote mapping of the cDNA read
(cellCounts_do_voting :3051), batched (cell, gene, UMI) sort-merge dedup
with hamming≤1 UMI merging (:3523-3620), CellRanger-style sparse output
(cellCounts_run_counting :4837).

Input modes (cell-counts.c `--inputMode`): FASTQ (R1 = barcode+UMI,
R2 = cDNA) and raw BCL/CBCL run directories with sample-sheet demultiplex
(io/bcl.py; sample-index matching with hamming<=1 rescue like the
cell-barcode rescue, input-blc.h:52).  Exact + hamming<=1 cell-barcode
matching, device alignment via align.Aligner, gene assignment via the
featureCounts interval engine, UMI dedup with hamming<=1 merge, sparse
matrix-market output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import dna

MAX_UMI_LEN = 14  # cell-counts.c:26


@dataclass
class CellCountsOptions:
    barcode_len: int = 16     # learned from the whitelist (cell-counts.c:280)
    umi_len: int = 10
    min_mapq: int = 0


class BarcodeMatcher:
    """Exact + hamming<=1 cell-barcode matching.

    The reference builds hash tables over half-barcode keys so one lookup
    finds all whitelist entries within hamming 1 (hamming_dist_ATGC_max1_2p,
    input-blc.h:52).  Same structure here: two dicts keyed by each half.
    """

    def __init__(self, whitelist: list[str]):
        lens = {len(b) for b in whitelist}
        assert len(lens) == 1, "all cell barcodes must have equal length"
        self.barcode_len = lens.pop()
        self.barcodes = list(whitelist)
        self.exact = {b: i for i, b in enumerate(self.barcodes)}
        h = self.barcode_len // 2
        self.half = h
        self.by_head: dict[str, list[int]] = {}
        self.by_tail: dict[str, list[int]] = {}
        for i, b in enumerate(self.barcodes):
            self.by_head.setdefault(b[:h], []).append(i)
            self.by_tail.setdefault(b[h:], []).append(i)

    def match(self, bc: str) -> int:
        """Whitelist index, or -1.  Exact first; else unique hamming<=1."""
        hit = self.exact.get(bc)
        if hit is not None:
            return hit
        h = self.half
        cands = set(self.by_head.get(bc[:h], ())) | set(
            self.by_tail.get(bc[h:], ())
        )
        best = -1
        for i in cands:
            w = self.barcodes[i]
            d = sum(1 for a, b in zip(bc, w) if a != b)
            if d <= 1:
                if best >= 0:
                    return -1  # ambiguous rescue -> dropped
                best = i
        return best


def hamming1_umi_merge(umi_counts: dict[str, int]) -> dict[str, int]:
    """Merge UMIs within hamming distance 1 into the most-supported UMI
    (cell-counts.c:3523-3620 sort-merge)."""
    if len(umi_counts) <= 1:
        return umi_counts
    order = sorted(umi_counts, key=lambda u: (-umi_counts[u], u))
    kept: list[str] = []
    merged: dict[str, int] = {}
    for u in order:
        target = None
        for k in kept:
            if len(k) == len(u) and sum(
                1 for a, b in zip(k, u) if a != b
            ) <= 1:
                target = k
                break
        if target is None:
            kept.append(u)
            merged[u] = umi_counts[u]
        else:
            merged[target] += umi_counts[u]
    return merged


class CellCounter:
    """Accumulates (cell, gene) -> set of UMIs, then dedups and emits the
    sparse matrix."""

    def __init__(self, matcher: BarcodeMatcher, gene_names: list[str],
                 umi_len: int = 10):
        self.matcher = matcher
        self.gene_names = gene_names
        self.umi_len = min(umi_len, MAX_UMI_LEN)
        # (cell_idx, gene_idx) -> {umi: reads}
        self.table: dict[tuple[int, int], dict[str, int]] = {}
        self.stats = {
            "reads": 0, "barcode_matched": 0, "assigned": 0,
        }

    def add(self, r1_seq: str, gene_idx: int) -> None:
        self.stats["reads"] += 1
        bl = self.matcher.barcode_len
        cell = self.matcher.match(r1_seq[:bl])
        if cell < 0:
            return
        self.stats["barcode_matched"] += 1
        if gene_idx < 0:
            return
        umi = r1_seq[bl : bl + self.umi_len]
        d = self.table.setdefault((cell, gene_idx), {})
        d[umi] = d.get(umi, 0) + 1
        self.stats["assigned"] += 1

    def finalise(self) -> tuple[np.ndarray, list[int]]:
        """Returns (COO entries [n,3] = (gene, cell, umi_count), cell list)."""
        cells = sorted({c for c, _ in self.table})
        cell_rank = {c: i for i, c in enumerate(cells)}
        entries = []
        for (c, g), umis in sorted(self.table.items()):
            merged = hamming1_umi_merge(umis)
            entries.append((g, cell_rank[c], len(merged)))
        return np.asarray(entries, dtype=np.int64).reshape(-1, 3), cells

    def write_matrix(
        self, out_dir: str, cell_calling: bool = False,
        umi_cutoff: float | None = None,
    ) -> dict:
        """CellRanger-style triplet: matrix.mtx + features.tsv +
        barcodes.tsv.  With cell_calling, only knee-called (+ rescued)
        barcodes are kept (cellCounts_merged_bootstrap_a_sample /
        _ambient_rescure) and the applied UMI cutoff is returned."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        entries, cells = self.finalise()
        info = {"umi_cutoff": 0, "n_cells": len(cells)}
        if cell_calling and len(cells):
            totals = {c: 0 for c in cells}
            for (g, cr, n) in entries:
                totals[cells[cr]] += int(n)
            called, rescued, cutoff = call_cells(totals, umi_cutoff)
            keep = set(called) | set(rescued)
            cells_kept = [c for c in cells if c in keep]
            rank = {c: i for i, c in enumerate(cells_kept)}
            entries = np.asarray(
                [
                    (g, rank[cells[cr]], n)
                    for (g, cr, n) in entries
                    if cells[cr] in keep
                ],
                dtype=np.int64,
            ).reshape(-1, 3)
            cells = cells_kept
            info = {"umi_cutoff": cutoff, "n_cells": len(cells)}
        with open(os.path.join(out_dir, "features.tsv"), "w") as f:
            for g in self.gene_names:
                f.write(f"{g}\t{g}\tGene Expression\n")
        with open(os.path.join(out_dir, "barcodes.tsv"), "w") as f:
            for c in cells:
                f.write(self.matcher.barcodes[c] + "\n")
        with open(os.path.join(out_dir, "matrix.mtx"), "w") as f:
            f.write("%%MatrixMarket matrix coordinate integer general\n")
            f.write(f"{len(self.gene_names)} {len(cells)} {len(entries)}\n")
            for g, c, n in entries:
                f.write(f"{g + 1} {c + 1} {n}\n")
        return info


def _hamming(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def demux_bcl(data_dir: str, entries, umi_guess: bool = True):
    """Demultiplex a raw run dir into per-sample (R1, R2) ReadBatches.

    entries: SampleEntry list from the rawdir sample sheet.  The sample
    index read is the IsIndexedRead segment (both for dual index); the
    barcode/UMI read is the first non-index segment and the cDNA read the
    last.  Index matching = exact, then unique hamming<=1 (the reference
    applies the same <=1 rescue to sample indices as to cell barcodes).
    Returns {sample_name: (ReadBatch r1, ReadBatch r2, n_reads)}.
    """
    from ..io.bcl import LANE_ALL, BclReader
    from ..io.fastq import ReadBatch
    from .. import dna

    rd = BclReader(data_dir)
    segs = rd.segments
    nonidx = [i for i, sg in enumerate(segs) if not sg.is_index]
    idxseg = [i for i, sg in enumerate(segs) if sg.is_index]
    assert len(nonidx) >= 2, "need barcode and cDNA reads in RunInfo.xml"
    r1_i, r2_i = nonidx[0], nonidx[-1]

    per_sample: dict[str, list] = {e.sample: [] for e in entries}
    for lane in rd.layout.lanes:
        lr = rd.read_lane(lane)
        cands = [
            e for e in entries if e.lane == LANE_ALL or e.lane == lane
        ]
        if not cands:
            continue
        n = lr.n_pf
        idx_seq = None
        if idxseg:
            idx_mat = np.concatenate(
                [lr.segments[i][0] for i in idxseg], axis=1
            )
            idx_seq = [row.tobytes().decode() for row in idx_mat]
        for r in range(n):
            sample = None
            if idx_seq is None:
                if len(cands) == 1:
                    sample = cands[0].sample
            else:
                q = idx_seq[r]
                best, best_d = None, 2
                ambiguous = False
                for e in cands:
                    want = (e.index or "").replace("-", "")
                    d = _hamming(q, want[: len(q)])
                    if d < best_d:
                        best, best_d, ambiguous = e, d, False
                    elif d == best_d and best is not None:
                        ambiguous = True
                if best is not None and not ambiguous and best_d <= 1:
                    sample = best.sample
            if sample is None:
                continue
            per_sample[sample].append((lane, r))

    out = {}
    for e in entries:
        picks = per_sample[e.sample]
        out[e.sample] = (picks, r1_i, r2_i, rd)
    return out


def batches_from_bcl(picks, r1_i: int, r2_i: int, rd, lane_cache: dict):
    """Build (r1, r2) ReadBatches for one sample's (lane, row) picks."""
    import numpy as np

    from ..io.fastq import ReadBatch
    from .. import dna

    def get_lane(lane):
        if lane not in lane_cache:
            lane_cache[lane] = rd.read_lane(lane)
        return lane_cache[lane]

    def mk_batch(seg_i):
        seqs, quals, names = [], [], []
        for lane, r in picks:
            lr = get_lane(lane)
            seqs.append(lr.segments[seg_i][0][r])
            quals.append(lr.segments[seg_i][1][r])
            names.append(f"R{len(names):08d}:L{lane:03d}")
        if not seqs:
            return None
        seq = np.stack(seqs)
        qual = np.stack(quals)
        n, L = seq.shape
        codes = np.zeros((n, L), np.uint8)
        ambig = np.zeros((n, L), bool)
        for i in range(n):
            srow = seq[i].tobytes()
            codes[i] = dna.encode(srow)
            ambig[i] = dna.ambig_mask(srow)
        return ReadBatch(
            names=names, codes=codes,
            lengths=np.full(n, L, np.int32), quals=qual, ambig=ambig,
        )

    return mk_batch(r1_i), mk_batch(r2_i)


# --- cell calling (knee point + ambient rescue) -----------------------------

SCRNA_BOOTSTRAP_HIGH_INDEX = 30      # cell-counts.c:4370
SCRNA_BOOTSTRAP_SAMPLING_TIMES = 100
SCRNA_IDX_PRIME = 11218439
AMBIENT_RESCUE_MEDIAN_FRACTION = 0.01  # cell-counts.c:4331
MIN_UMIS_FOR_CANDIDATE_RESCUE = 500    # cell-counts.c:4330
MAX_CANDIDATE_CELLS = 20000


def call_cells(
    cell_umis: dict[int, int], umi_cutoff: float | None = None
) -> tuple[list[int], list[int], int]:
    """High-confidence cell calling + ambient-rescue candidates.

    Reference: cellCounts_merged_bootstrap_a_sample (cell-counts.c:4374):
    100 deterministic bootstrap resamples of the per-barcode UMI totals;
    each takes its 30th-highest count / 10 as a threshold and counts
    barcodes above it; the averaged count is the number of called cells
    (CellRanger's knee heuristic).  `--umiCutoff` overrides with a fixed
    threshold.  Ambient rescue (cellCounts_merged_ambient_rescure :4333):
    non-called barcodes with UMIs >= max(1% of the called-cell median, 500)
    become rescue candidates (<= 20000, top 45000 ranks only).

    Returns (called cell ids by descending UMIs, rescue candidates,
    umi_cutoff_used)."""
    order = sorted(cell_umis, key=lambda c: (-cell_umis[c], c))
    n = len(order)
    if n == 0:
        return [], [], 0
    umis_desc = [cell_umis[c] for c in order]

    if umi_cutoff is not None and umi_cutoff >= 0:
        called = [c for c in order if cell_umis[c] >= umi_cutoff - 0.1]
        last_umi = cell_umis[called[-1]] if called else 0
    else:
        total = 0
        seed = n // 2
        for _ in range(SCRNA_BOOTSTRAP_SAMPLING_TIMES):
            resampled = []
            for _x in range(n):
                seed %= n
                resampled.append(umis_desc[seed])
                seed += SCRNA_IDX_PRIME
            resampled.sort()
            hi_idx = max(len(resampled) - SCRNA_BOOTSTRAP_HIGH_INDEX, 0)
            thr = int(resampled[hi_idx] / 10.0 + 0.500000001)
            for v in reversed(resampled):
                if v >= thr:
                    total += 1
                else:
                    break
        n_called = int(total / SCRNA_BOOTSTRAP_SAMPLING_TIMES + 0.500000001)
        called = order[: min(n, n_called)]
        last_umi = cell_umis[called[-1]] if called else 0

    called_set = set(called)
    rescued: list[int] = []
    if called:
        median_umis = cell_umis[called[(len(called) - 1) // 2]]
        cut = int(median_umis * AMBIENT_RESCUE_MEDIAN_FRACTION + 0.500000001)
        for rank, c in enumerate(order):
            if c in called_set:
                continue
            v = cell_umis[c]
            if v < cut or v < MIN_UMIS_FOR_CANDIDATE_RESCUE or rank >= 45000:
                break
            if len(rescued) < MAX_CANDIDATE_CELLS:
                rescued.append(c)
    return called, rescued, last_umi
