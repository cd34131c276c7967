"""GTF / SAF annotation parsing.

Reference: load_features_annotation (HelperFunctions.c:1077) and
load_feature_info (readSummary.c:975).  GTF rows of the configured feature
type (default "exon") contribute one feature each, grouped by the value of
the configured attribute (default "gene_id").  SAF is the 5-column
GeneID/Chr/Start/End/Strand format with a case-insensitive header.
Feature (gene) order follows first appearance, matching the reference's
output ordering.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Annotation:
    gene_names: list[str]          # unique, in order of first appearance
    feat_gene: np.ndarray          # int32 [F] index into gene_names
    feat_chro: list[str]           # [F] chromosome name per feature
    feat_start: np.ndarray         # int32 [F] 1-based inclusive
    feat_end: np.ndarray           # int32 [F] 1-based inclusive
    feat_strand: np.ndarray        # int8 [F] 0='+',1='-',2='.'
    # --extraAttributes (readSummary.c:7379): per-gene extra GTF attribute
    # values, one list per requested attribute name; "NA" when absent.
    extra_attr_names: list[str] = field(default_factory=list)
    gene_extra: list[list[str]] = field(default_factory=list)
    # --detectionCall (readSummary.c:1152-1159): per-gene GC-fraction
    # string echoed from the SAF annotation's 6th column; None = not loaded
    gene_gc: dict[str, str] | None = None

    @property
    def n_features(self) -> int:
        return len(self.feat_start)

    def gene_lengths(self) -> np.ndarray:
        """Union length of each gene's merged exons (reference merges
        overlapping exons per gene for the Length column)."""
        out = np.zeros(len(self.gene_names), dtype=np.int64)
        order = np.lexsort((self.feat_start, self.feat_gene))
        by_gene: dict[tuple[int, str], list[tuple[int, int]]] = {}
        for i in order:
            key = (int(self.feat_gene[i]), self.feat_chro[i])
            by_gene.setdefault(key, []).append(
                (int(self.feat_start[i]), int(self.feat_end[i]))
            )
        for (g, _chro), ivs in by_gene.items():
            cur_s, cur_e = ivs[0]
            total = 0
            for s, e in ivs[1:]:
                if s > cur_e + 1:
                    total += cur_e - cur_s + 1
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            total += cur_e - cur_s + 1
            out[g] += total
        return out


def _open(path):
    f = open(path, "rb")
    if f.peek(2)[:2] == b"\x1f\x8b":
        f.close()
        return gzip.open(path, "rt")
    f.close()
    return open(path)


def parse_gtf_attr(attrs: str, name: str) -> str | None:
    """Extract an attribute value from a GTF attribute column
    (HelperFunctions.c GTF attribute extraction)."""
    for chunk in attrs.split(";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        if " " in chunk:
            k, v = chunk.split(" ", 1)
        elif "=" in chunk:  # GFF style
            k, v = chunk.split("=", 1)
        else:
            continue
        if k == name:
            return v.strip().strip('"')
    return None


def load_annotation(
    path: str,
    fmt: str = "GTF",
    feature_type: str = "exon",
    attr_type: str = "gene_id",
    extra_attrs: list[str] | None = None,
    gc_column: bool = False,
) -> Annotation:
    gene_idx: dict[str, int] = {}
    gene_gc: dict[str, str] | None = {} if gc_column else None
    gene_names: list[str] = []
    fg, fc, fs, fe, fstr = [], [], [], [], []
    extra_attrs = extra_attrs or []
    # per attr name: gene index -> ordered unique values
    extra_vals: list[dict[int, list[str]]] = [{} for _ in extra_attrs]

    def gid(name: str) -> int:
        if name not in gene_idx:
            gene_idx[name] = len(gene_names)
            gene_names.append(name)
        return gene_idx[name]

    with _open(path) as f:
        if fmt.upper() == "SAF":
            header_seen = False
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                cols = line.split("\t")
                if not header_seen:
                    header_seen = True
                    if cols[0].lower() in ("geneid", "gene_id"):
                        continue
                if len(cols) < 5:
                    continue
                fg.append(gid(cols[0]))
                fc.append(cols[1])
                fs.append(int(cols[2]))
                fe.append(int(cols[3]))
                fstr.append({"+": 0, "-": 1}.get(cols[4], 2))
                if gene_gc is not None and len(cols) > 5 and cols[5]:
                    gene_gc[cols[0]] = cols[5]
        else:
            for line in f:
                if not line.strip() or line.startswith("#"):
                    continue
                cols = line.rstrip("\n").split("\t")
                if len(cols) < 9 or cols[2] != feature_type:
                    continue
                name = parse_gtf_attr(cols[8], attr_type)
                if name is None:
                    continue
                g = gid(name)
                fg.append(g)
                fc.append(cols[0])
                fs.append(int(cols[3]))
                fe.append(int(cols[4]))
                fstr.append({"+": 0, "-": 1}.get(cols[6], 2))
                for ai, aname in enumerate(extra_attrs):
                    v = parse_gtf_attr(cols[8], aname)
                    if v is not None:
                        vals = extra_vals[ai].setdefault(g, [])
                        if v not in vals:
                            vals.append(v)

    gene_extra = [
        [";".join(extra_vals[ai].get(g, [])) or "NA"
         for g in range(len(gene_names))]
        for ai in range(len(extra_attrs))
    ]
    return Annotation(
        gene_names=gene_names,
        feat_gene=np.asarray(fg, dtype=np.int32),
        feat_chro=fc,
        feat_start=np.asarray(fs, dtype=np.int32),
        feat_end=np.asarray(fe, dtype=np.int32),
        feat_strand=np.asarray(fstr, dtype=np.int8),
        extra_attr_names=list(extra_attrs),
        gene_extra=gene_extra,
        gene_gc=gene_gc,
    )
