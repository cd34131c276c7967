"""subjunc equivalent (RNA-seq junction-aware alignment).

Reference CLI: core-interface-subjunc.c:12-90, :252.  Round-1 scope: the
same engine with subjunc defaults (14 subreads, min-votes 1, RNA scoring);
exon-exon junction discovery output (.junction.bed) lands with the
junction module (align/junctions.py).
"""

from __future__ import annotations

import sys

from .align import build_parser, run_align


def main(argv=None) -> int:
    import argparse

    ap = build_parser(prog="subread_tpu-subjunc", subjunc=True)
    ap.add_argument("--allJunctions", action="store_true",
                    help="report non-canonical junctions and fusions")
    # subjunc-specific knobs (core-interface-subjunc.c parse_opts_subjunc)
    ap.add_argument("--exonicSubreadFrac", type=float, default=0.3,
                    help="min fraction of exonic subreads (default 0.3)")
    ap.add_argument("--minMappedFraction", type=int, default=0,
                    help="min mapped fraction of a reported read")
    ap.add_argument("--relaxMismatchedBases", action="store_true",
                    help="no mismatch limit; minMappedFraction=61")
    ap.add_argument("--junctionIns", type=int, default=0,
                    help="allow insertions at junctions (disables the "
                    "donor-site check, as upstream)")
    ap.add_argument("--disableBigMargin", action="store_true",
                    help="disable the big-margin junction filter")
    ap.add_argument("--extendIndelDetection", action="store_true",
                    help="extended indel search (compat)")
    ap.add_argument("--pairedSAM", action="store_true",
                    help="SAM/BAM read input is paired-end")
    ap.add_argument("--singleSAM", action="store_true",
                    help="SAM/BAM read input is single-end")
    args = ap.parse_args(argv)
    if args.relaxMismatchedBases:
        # reference: both mismatch caps -> 999, min_mapped_fraction 61
        args.max_mismatches = 999
        args.minMappedFraction = 61
    return run_align(args, subjunc=True)


if __name__ == "__main__":
    sys.exit(main())
