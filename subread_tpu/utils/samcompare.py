"""Field-by-field SAM comparison against reference-binary fixtures.

The fixture format is the output of the reference subread-align/subjunc
binary (`/root/reference/src/core.c:1888 write_single_fragment`) with
SEQ/QUAL dropped: tab-separated
  qname flag rname pos mapq cigar rnext pnext tlen tag...tag
one line per record, gzipped.

Comparison is record-level: for each (qname, read1/read2) key we compare
FLAG, RNAME, POS, MAPQ, CIGAR, RNEXT, PNEXT, TLEN and the HI/NH/NM tags.
A record is "fully equal" when every compared field matches.
"""

from __future__ import annotations

import gzip
from collections import Counter
from dataclasses import dataclass, field


# FLAG bits that affect correctness (0x100/0x200/0x400 never set by subread)
_FLAG_MASK = 0xFFF


def _parse_tags(tags):
    out = {}
    for t in tags:
        if not t:
            continue
        name, _typ, val = t.split(":", 2)
        out[name] = val
    return out


@dataclass
class RefRecord:
    flag: int
    rname: str
    pos: int
    mapq: int
    cigar: str
    rnext: str
    pnext: int
    tlen: int
    tags: dict


def load_ref_full(path: str) -> dict:
    """Load a .ref-full.tsv.gz fixture -> {(qname, which): [RefRecord,...]}.

    `which` is 1 for read1/unpaired, 2 for read2. Multi-mapping reported
    records (HI>1) accumulate in the list in file order.
    """
    ref = {}
    with gzip.open(path, "rt") as f:
        for line in f:
            fds = line.rstrip("\n").split("\t")
            flag = int(fds[1])
            which = 2 if flag & 0x80 else 1
            rec = RefRecord(
                flag=flag & _FLAG_MASK,
                rname=fds[2],
                pos=int(fds[3]),
                mapq=int(fds[4]),
                cigar=fds[5],
                rnext=fds[6],
                pnext=int(fds[7]),
                tlen=int(fds[8]),
                tags=_parse_tags(fds[9:]),
            )
            ref.setdefault((fds[0], which), []).append(rec)
    return ref


@dataclass
class CompareStats:
    total: int = 0          # keys present in both outputs
    full_equal: int = 0     # every compared field equal
    core_equal: int = 0     # FLAG/RNAME/POS/CIGAR equal (ignoring MAPQ/tags)
    ref_only_mapped: int = 0
    ours_only_mapped: int = 0
    both_unmapped: int = 0
    field_mismatch: Counter = field(default_factory=Counter)
    examples: dict = field(default_factory=dict)

    @property
    def full_rate(self):
        return self.full_equal / max(1, self.total)

    @property
    def core_rate(self):
        return self.core_equal / max(1, self.total)

    def report(self) -> str:
        lines = [
            f"total both-present: {self.total}",
            f"full-record equal : {self.full_equal} ({self.full_rate:.4%})",
            f"core equal        : {self.core_equal} ({self.core_rate:.4%})",
            f"ref-only mapped   : {self.ref_only_mapped}",
            f"ours-only mapped  : {self.ours_only_mapped}",
            f"both unmapped     : {self.both_unmapped}",
            "mismatches by field:",
        ]
        for k, v in self.field_mismatch.most_common():
            ex = self.examples.get(k, "")
            lines.append(f"  {k:10s} {v:6d}   e.g. {ex}")
        return "\n".join(lines)


def compare_sam_to_ref(sam_path: str, ref: dict,
                       compare_tags=("NM", "NH", "HI"),
                       mapq: bool = True) -> CompareStats:
    """Compare our SAM output (primary records) to a loaded fixture."""
    st = CompareStats()
    seen = set()
    with open(sam_path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            fds = line.rstrip("\n").split("\t")
            flag = int(fds[1])
            if flag & 0x100:
                continue  # secondaries compared separately if ever needed
            which = 2 if flag & 0x80 else 1
            key = (fds[0], which)
            recs = ref.get(key)
            if recs is None:
                continue
            seen.add(key)
            r = recs[0]
            ours_unmapped = bool(flag & 0x4)
            ref_unmapped = bool(r.flag & 0x4)
            if ours_unmapped and ref_unmapped:
                st.both_unmapped += 1
                st.total += 1
                st.full_equal += 1
                st.core_equal += 1
                continue
            if ref_unmapped:
                st.ours_only_mapped += 1
                continue
            if ours_unmapped:
                st.ref_only_mapped += 1
                continue
            st.total += 1
            ours_tags = _parse_tags(fds[11:])
            mism = []
            if (flag & _FLAG_MASK) != r.flag:
                mism.append("FLAG")
            if fds[2] != r.rname:
                mism.append("RNAME")
            if int(fds[3]) != r.pos:
                mism.append("POS")
            if fds[5] != r.cigar:
                mism.append("CIGAR")
            core_ok = not mism
            if mapq and int(fds[4]) != r.mapq:
                mism.append("MAPQ")
            if fds[6] != r.rnext:
                mism.append("RNEXT")
            if int(fds[7]) != r.pnext:
                mism.append("PNEXT")
            if int(fds[8]) != r.tlen:
                mism.append("TLEN")
            for t in compare_tags:
                if t in r.tags and ours_tags.get(t) != r.tags[t]:
                    mism.append(t)
            if core_ok:
                st.core_equal += 1
            if not mism:
                st.full_equal += 1
            else:
                sig = "+".join(mism)
                st.field_mismatch[sig] += 1
                if sig not in st.examples:
                    st.examples[sig] = (
                        f"{fds[0]}/{which}: ours "
                        f"({flag},{fds[2]},{fds[3]},{fds[4]},{fds[5]},"
                        f"{fds[8]},NM={ours_tags.get('NM')}) "
                        f"ref ({r.flag},{r.rname},{r.pos},{r.mapq},"
                        f"{r.cigar},{r.tlen},NM={r.tags.get('NM')})"
                    )
    for key, recs in ref.items():
        if key not in seen and not (recs[0].flag & 0x4):
            st.ref_only_mapped += 1
    return st
