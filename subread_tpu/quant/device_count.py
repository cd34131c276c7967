"""TPU-native featureCounts counting kernel.

Reference model: featureCounts walks each thread's reads through a
per-chromosome sorted feature table (binary search + scan-back,
`/root/reference/src/readSummary.c:1592-1680`) into per-thread count
tables merged at the end (`fc_thread_merge_results`,
`/root/reference/src/readSummary.c:5795`).

TPU redesign (SURVEY.md §2 "per-chip count segments + psum"):

* The host decomposes the (possibly overlapping) exon set into
  **disjoint coverage spans** in a concatenated-chromosome global
  coordinate space.  Each span carries one label: the gene index when
  exactly one gene covers it, ``MULTI`` when two or more genes overlap
  there.  Because spans are disjoint and sorted, the spans a read
  section touches form one contiguous range found by two vectorized
  ``searchsorted`` calls — no scan-back loop, no block max-end trick,
  and every read in the batch resolves in the same fused XLA program.
* Per read, the distinct overlapped genes are counted with one sort of
  a small fixed-width label window; the assignment status (Assigned /
  NoFeatures / Ambiguity plus host-precomputed gates) and a dense
  ``[n_genes]`` count vector come out of one ``segment_sum``.
* Multi-chip: each chip counts its shard of the reads axis and the
  dense vectors are ``psum``-merged over the mesh — the TPU equivalent
  of the reference's per-thread tables + final merge.

Scope: the default unstranded/stranded SE gene-level unique-counting
configuration (the same subset the native C++ fast path accelerates).
Everything else falls back to the host `FeatureCounter`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

NONE = -1  # label: no feature covers this span

# per-read status codes (summary row order mirrors SUMMARY_CATEGORIES)
ST_ASSIGNED = 0
ST_UNMAPPED = 1
ST_MULTIMAPPING = 2
ST_NOFEATURES = 3
ST_AMBIGUITY = 4
ST_PAD = 5  # shard padding; dropped from the summary

STATUS_NAMES = [
    "Assigned",
    "Unassigned_Unmapped",
    "Unassigned_MultiMapping",
    "Unassigned_NoFeatures",
    "Unassigned_Ambiguity",
]

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def _merge_gene_intervals(ann):
    """Per-gene merged exon intervals: {(gene, chro): [(s, e), ...]}."""
    order = np.lexsort((ann.feat_start, ann.feat_gene))
    merged: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for i in order:
        key = (int(ann.feat_gene[i]), ann.feat_chro[i])
        s, e = int(ann.feat_start[i]), int(ann.feat_end[i])
        ivs = merged.setdefault(key, [])
        if ivs and s <= ivs[-1][1] + 1:
            ivs[-1] = (ivs[-1][0], max(ivs[-1][1], e))
        else:
            ivs.append((s, e))
    return merged


def _build_spans_for_chrom(events):
    """Sweep one chromosome's (pos, delta, gene) events into disjoint
    spans [(start, end_inclusive, label)] where label is a gene index
    when exactly one gene covers the span, MULTI(-2 placeholder) when
    several do.  Zero-coverage gaps are not emitted."""
    events.sort()
    spans = []
    active: dict[int, int] = {}
    prev_pos = None
    i, n = 0, len(events)
    while i < n:
        pos = events[i][0]
        if active and prev_pos is not None and prev_pos <= pos - 1:
            label = next(iter(active)) if len(active) == 1 else -2
            spans.append((prev_pos, pos - 1, label))
        while i < n and events[i][0] == pos:
            _, delta, g = events[i]
            c = active.get(g, 0) + delta
            if c:
                active[g] = c
            else:
                active.pop(g, None)
            i += 1
        prev_pos = pos
    # coalesce adjacent same-label spans (keeps the per-section span
    # window W small)
    out = []
    for s, e, lab in spans:
        if out and out[-1][2] == lab and out[-1][1] + 1 == s:
            out[-1] = (out[-1][0], e, lab)
        else:
            out.append((s, e, lab))
    return out


@dataclass
class _ChromWindow:
    offset: int     # global coordinate of local position 0
    max_end: int    # largest annotated end on this chromosome (local)


class DeviceCounter:
    """Device-side gene-level read counter over a fixed annotation.

    ``W`` bounds how many disjoint spans one read section may touch; the
    kernel reports an overflow count so the host can fall back for the
    (annotation, read-length) combinations that exceed it.
    """

    def __init__(self, annotation, strand: int = 0, w: int = 16,
                 max_sections: int = 10):
        self.ann = annotation
        self.strand = int(strand)
        self.w = int(w)
        self.max_sections = int(max_sections)
        self.n_genes = len(annotation.gene_names)
        self.multi = self.n_genes  # sentinel label: >=2 genes cover span

        # fragment strand must match the feature strand unless the
        # feature is unstranded ('.').  With -s we build one span table
        # per fragment strand from the matching feature subset.
        n_tables = 1 if self.strand == 0 else 2
        self._tables = []
        self._windows: list[dict[str, _ChromWindow]] = []
        for t in range(n_tables):
            if self.strand == 0:
                keep = np.ones(annotation.n_features, dtype=bool)
            else:
                fs = annotation.feat_strand
                keep = (fs == t) | (fs == 2)
            self._tables.append(self._build_table(keep))

    def _build_table(self, keep: np.ndarray):
        ann = self.ann
        merged = _merge_gene_intervals(_AnnView(ann, keep))
        by_chrom: dict[str, list] = {}
        for (g, chro), ivs in merged.items():
            ev = by_chrom.setdefault(chro, [])
            for s, e in ivs:
                ev.append((s, 1, g))
                ev.append((e + 1, -1, g))
        chroms = sorted(by_chrom)
        starts, ends, labels = [], [], []
        windows: dict[str, _ChromWindow] = {}
        offset = 0
        for chro in chroms:
            spans = _build_spans_for_chrom(by_chrom[chro])
            if not spans:
                continue
            max_end = max(e for _, e, _ in spans)
            win = _ChromWindow(offset=offset, max_end=max_end)
            # fuzzy aliases as in FeatureCounter (chr prefix, case)
            aliases = {chro, chro.lower(),
                       chro[3:] if chro.lower().startswith("chr")
                       else "chr" + chro}
            for a in aliases:
                windows.setdefault(a, win)
            windows[chro] = win
            for s, e, lab in spans:
                starts.append(offset + s)
                ends.append(offset + e)
                labels.append(self.multi if lab == -2 else lab)
            offset += max_end + 2
        if offset >= 2**31:
            raise ValueError("annotation coordinate space exceeds int32")
        self._windows.append(windows)
        return (
            np.asarray(starts, dtype=np.int32),
            np.asarray(ends, dtype=np.int32),
            np.asarray(labels, dtype=np.int32),
        )

    # ------------------------------------------------------------------
    # host-side read preparation

    def sections_from_sam(self, path: str):
        """Parse a SAM file into the kernel's input arrays.

        Returns (sec_start[R,S], sec_end[R,S], gate[R]) int32 arrays in
        *global* coordinates.  gate pre-resolves the host-side gates:
        0 ok, ST_UNMAPPED, ST_MULTIMAPPING.  Sections on chromosomes
        absent from the annotation are dropped (NoFeatures when none
        remain, matching readSummary.c's unmatched-chromosome warning
        path)."""
        S = self.max_sections
        starts, ends, gates, strands = [], [], [], []
        with open(path) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                fds = line.rstrip("\n").split("\t")
                flag = int(fds[1])
                # each record is its own SE fragment, exactly as the
                # host FeatureCounter streams them (count_sam)
                if flag & 0x4 or fds[5] == "*":
                    starts.append([0] * S)
                    ends.append([-1] * S)
                    gates.append(ST_UNMAPPED)
                    strands.append(0)
                    continue
                nh = 1
                for t in fds[11:]:
                    if t.startswith("NH:i:"):
                        nh = int(t[5:])
                        break
                if nh > 1:
                    starts.append([0] * S)
                    ends.append([-1] * S)
                    gates.append(ST_MULTIMAPPING)
                    strands.append(0)
                    continue
                secs = self._cigar_sections(int(fds[3]), fds[5])
                strand_bit = 1 if (flag & 0x10) else 0
                tbl = 0
                if self.strand:
                    tbl = strand_bit if self.strand == 1 else strand_bit ^ 1
                win = self._windows[tbl]
                row_s, row_e = [], []
                cw = win.get(fds[2])
                if cw is not None:
                    for s, e in secs[:S]:
                        if s > cw.max_end:
                            continue
                        row_s.append(cw.offset + s)
                        row_e.append(cw.offset + min(e, cw.max_end))
                row_s += [0] * (S - len(row_s))
                row_e += [-1] * (S - len(row_e))
                starts.append(row_s)
                ends.append(row_e)
                gates.append(0)
                strands.append(tbl)
        return (
            np.asarray(starts, dtype=np.int32).reshape(-1, S),
            np.asarray(ends, dtype=np.int32).reshape(-1, S),
            np.asarray(gates, dtype=np.int32),
            np.asarray(strands, dtype=np.int32),
        )

    def fragments_from_sam(self, path: str):
        """PE variant of sections_from_sam: records pair by QNAME (orphan
        hash, arbitrary order) and each FRAGMENT contributes the union of
        both ends' sections — the default `-p --countReadPairs` fragment
        semantics (readSummary.c:2924 PE path, default gates).  Secondary/
        supplementary records are skipped like the host counter's default
        path.  Returns the same arrays as sections_from_sam with one row
        per fragment."""
        S = self.max_sections
        pending: dict[str, tuple] = {}
        starts, ends, gates, strands = [], [], [], []

        def emit(r1, r2):
            # r = (mapped, nh, chro, secs, strand_bit) or None for a
            # missing mate (orphan flushed at EOF)
            ms = [r for r in (r1, r2) if r is not None]
            if not any(r[0] for r in ms):
                starts.append([0] * S)
                ends.append([-1] * S)
                gates.append(ST_UNMAPPED)
                strands.append(0)
                return
            if any(r[0] and r[1] > 1 for r in ms):
                starts.append([0] * S)
                ends.append([-1] * S)
                gates.append(ST_MULTIMAPPING)
                strands.append(0)
                return
            tbl = 0
            first = next(r for r in ms if r[0])
            if self.strand:
                tbl = first[4] if self.strand == 1 else first[4] ^ 1
            win = self._windows[tbl]
            row_s, row_e = [], []
            for r in ms:
                if not r[0]:
                    continue
                cw = win.get(r[2])
                if cw is None:
                    continue
                for s, e in r[3]:
                    if s > cw.max_end or len(row_s) >= S:
                        continue
                    row_s.append(cw.offset + s)
                    row_e.append(cw.offset + min(e, cw.max_end))
            row_s += [0] * (S - len(row_s))
            row_e += [-1] * (S - len(row_e))
            starts.append(row_s)
            ends.append(row_e)
            gates.append(0)
            strands.append(tbl)

        with open(path) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                fds = line.rstrip("\n").split("\t")
                flag = int(fds[1])
                if flag & 0x900:       # secondary/supplementary
                    continue
                mapped = not (flag & 0x4) and fds[5] != "*"
                nh = 1
                for t in fds[11:]:
                    if t.startswith("NH:i:"):
                        nh = int(t[5:])
                        break
                secs = (
                    self._cigar_sections(int(fds[3]), fds[5]) if mapped else []
                )
                rec = (mapped, nh, fds[2], secs, 1 if (flag & 0x10) else 0)
                other = pending.pop(fds[0], None)
                if other is None:
                    pending[fds[0]] = rec
                else:
                    emit(other, rec)
        for rec in pending.values():
            emit(rec, None)
        return (
            np.asarray(starts, dtype=np.int32).reshape(-1, S),
            np.asarray(ends, dtype=np.int32).reshape(-1, S),
            np.asarray(gates, dtype=np.int32),
            np.asarray(strands, dtype=np.int32),
        )

    def _cigar_sections(self, pos: int, cigar: str):
        """Mirror of featurecounts._sections (same max_mop / D / N
        semantics) on (pos, cigar) directly."""
        secs = []
        p = pos
        sec_start = None
        n_m = 0
        for ln, op in _CIG_RE.findall(cigar):
            ln = int(ln)
            if op in "M=X":
                n_m += 1
                if n_m > self.max_sections:
                    break
                if sec_start is None:
                    sec_start = p
                p += ln
            elif op == "D":
                p += ln
            elif op == "N":
                if sec_start is not None:
                    secs.append((sec_start, p - 1))
                    sec_start = None
                p += ln
        if sec_start is not None:
            secs.append((sec_start, p - 1))
        return secs

    # ------------------------------------------------------------------
    # device kernel

    @property
    def _device_tables(self):
        # converted at trace time (the tables embed as jit constants);
        # NOT cached: a cached tracer would leak across traces and the
        # arrays must follow the active default device / mesh
        import jax.numpy as jnp

        return [tuple(jnp.asarray(a) for a in t) for t in self._tables]

    def _kernel(self, sec_start, sec_end, gate, strand_tbl):
        """Pure function: global-coord sections -> (counts, summary,
        status, overflow).  Jit/shard_map-safe."""
        import jax
        import jax.numpy as jnp

        R, S = sec_start.shape
        W = self.w
        valid = sec_end >= sec_start  # invalid rows use (0, -1)

        def one_table(tbl_idx):
            span_s, span_e, span_lab = self._device_tables[tbl_idx]
            lo = jnp.searchsorted(span_e, sec_start, side="left")
            hi = jnp.searchsorted(span_s, sec_end, side="right")
            return lo, hi, span_lab

        if len(self._device_tables) == 1:
            lo, hi, span_lab = one_table(0)
            labs_of = lambda idx: span_lab[idx]
        else:
            lo0, hi0, lab0 = one_table(0)
            lo1, hi1, lab1 = one_table(1)
            pick = strand_tbl[:, None].astype(bool)
            lo = jnp.where(pick, lo1, lo0)
            hi = jnp.where(pick, hi1, hi0)
            pad = max(0, lab1.shape[0] - lab0.shape[0])
            lab0p = jnp.pad(lab0, (0, pad), constant_values=NONE)
            pad0 = max(0, lab0.shape[0] - lab1.shape[0])
            lab1p = jnp.pad(lab1, (0, pad0), constant_values=NONE)
            labs2 = jnp.stack([lab0p, lab1p])  # [2, Gmax]

            def labs_of(idx):
                return labs2[strand_tbl[:, None, None], idx]

        k = jnp.arange(W)[None, None, :]
        idx = lo[:, :, None] + k                      # [R, S, W]
        gmax = max(t[0].shape[0] for t in self._device_tables)
        in_range = (idx < hi[:, :, None]) & valid[:, :, None]
        idx = jnp.clip(idx, 0, gmax - 1)
        labels = jnp.where(in_range, labs_of(idx), NONE)
        overflow = jnp.sum(
            jnp.any((hi - lo > W) & valid, axis=1).astype(jnp.int32)
        )

        flat = jnp.sort(labels.reshape(R, S * W), axis=1)
        prev = jnp.concatenate(
            [jnp.full((R, 1), NONE, dtype=flat.dtype), flat[:, :-1]], axis=1
        )
        distinct = (flat >= 0) & (flat != prev)
        n_distinct = distinct.sum(axis=1)
        has_multi = jnp.any(flat == self.multi, axis=1)
        gene = flat[:, -1]

        status = jnp.where(
            has_multi | (n_distinct >= 2),
            ST_AMBIGUITY,
            jnp.where(n_distinct == 0, ST_NOFEATURES, ST_ASSIGNED),
        )
        status = jnp.where(gate > 0, gate, status)
        assigned = status == ST_ASSIGNED
        counts = jax.ops.segment_sum(
            assigned.astype(jnp.int32),
            jnp.where(assigned, gene, 0),
            num_segments=self.n_genes,
        )
        summary = jnp.zeros(6, dtype=jnp.int32).at[status].add(1)[:5]
        return counts, summary, status, overflow

    def count(self, sec_start, sec_end, gate, strand_tbl=None):
        """Single-device jitted count.  Returns numpy
        (counts[n_genes], summary[5], status[R], overflow)."""
        import jax
        import numpy as np

        if strand_tbl is None:
            strand_tbl = np.zeros(sec_start.shape[0], dtype=np.int32)
        fn = jax.jit(self._kernel)
        c, s, st, ov = fn(sec_start, sec_end, gate, strand_tbl)
        return (np.asarray(c), np.asarray(s), np.asarray(st), int(ov))

    def count_sharded(self, mesh, sec_start, sec_end, gate,
                      strand_tbl=None, axis: str = "reads"):
        """Multi-chip counting: reads sharded over ``axis``, per-chip
        dense count vectors psum-merged (fc_thread_merge_results's TPU
        equivalent).  Returns the same tuple as :meth:`count` minus the
        per-read status (which stays sharded)."""
        import jax
        import numpy as np
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        n = mesh.shape[axis]
        R = sec_start.shape[0]
        pad = (-R) % n
        if strand_tbl is None:
            strand_tbl = np.zeros(R, dtype=np.int32)
        if pad:
            sec_start = np.pad(sec_start, ((0, pad), (0, 0)))
            sec_end = np.pad(
                sec_end, ((0, pad), (0, 0)), constant_values=-1
            )
            gate = np.pad(gate, (0, pad), constant_values=ST_PAD)
            strand_tbl = np.pad(strand_tbl, (0, pad))

        def shard_fn(ss, se, g, st):
            c, s, _, ov = self._kernel(ss, se, g, st)
            return (
                jax.lax.psum(c, axis),
                jax.lax.psum(s, axis),
                jax.lax.psum(ov, axis),
            )

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()),
        )
        c, s, ov = jax.jit(fn)(sec_start, sec_end, gate, strand_tbl)
        return np.asarray(c), np.asarray(s), int(ov)


class _AnnView:
    """Annotation restricted to a feature mask (for stranded tables)."""

    def __init__(self, ann, keep):
        idx = np.flatnonzero(keep)
        self.feat_start = ann.feat_start[idx]
        self.feat_end = ann.feat_end[idx]
        self.feat_gene = ann.feat_gene[idx]
        self.feat_chro = [ann.feat_chro[i] for i in idx]
