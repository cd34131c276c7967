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
    ap = build_parser(prog="subread_tpu-subjunc", subjunc=True)
    ap.add_argument("--allJunctions", action="store_true",
                    help="report non-canonical junctions and fusions")
    args = ap.parse_args(argv)
    return run_align(args, subjunc=True)


if __name__ == "__main__":
    sys.exit(main())
