"""sublong CLI — long-read mapper (reference longread-one/, sublong)."""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="subread_tpu-sublong")
    ap.add_argument("-i", "--index", required=True)
    ap.add_argument("-r", "--reads", required=True, help="long-read FASTQ")
    ap.add_argument("-o", "--output", required=True, help="SAM/BAM output")
    ap.add_argument("--min-windows", type=int, default=2,
                    help="minimum chained 100bp windows for a mapping")
    ap.add_argument("-T", "--threads", type=int, default=1)
    # reference longread-mapping.c getopt "Xr:i:o:B:T:v"
    ap.add_argument("-X", dest="rna_mode", action="store_true",
                    help="RNA-seq mode (junction-aware chaining scores)")
    ap.add_argument("-B", dest="multi_best", type=int, default=1,
                    help="report up to N best alignments per read (<=20)")
    ap.add_argument("--SAMoutput", action="store_true",
                    help="write SAM text instead of BAM")
    ap.add_argument("-v", "--version", action="version",
                    version="subread_tpu-sublong")
    args = ap.parse_args(argv)
    args.multi_best = min(max(1, args.multi_best), 20)

    from ..align.longread import sublong_file
    from ..align.pipeline import Aligner
    from ..config import aligner_config
    from .align import load_index_any

    t0 = time.time()
    genome, index = load_index_any(args.index)
    cfg_kw = dict(batch_reads=2048, min_votes=2,
                  multi_best=args.multi_best)
    if args.rna_mode:
        # -X (longread-mapping.c): RNA-seq chaining scores — junctions
        # between chained anchors become N ops; DP score set match 6 /
        # mismatch 0 / gap open -6 / gap extend -1
        cfg_kw.update(dp_match=6, dp_mismatch=0, dp_gap_open=-6,
                      dp_gap_ext=-1, detect_junctions=True)
    aligner = Aligner(genome, index, aligner_config(**cfg_kw))
    mapped, total = sublong_file(
        aligner, args.reads, args.output, min_windows=args.min_windows,
        sam_output=args.SAMoutput,
    )
    print(
        f"// sublong: mapped {mapped}/{total} long reads in "
        f"{time.time()-t0:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
