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
    args = ap.parse_args(argv)

    from ..align.longread import sublong_file
    from ..align.pipeline import Aligner
    from ..config import aligner_config
    from .align import load_index_any

    t0 = time.time()
    genome, index = load_index_any(args.index)
    aligner = Aligner(
        genome, index, aligner_config(batch_reads=2048, min_votes=2)
    )
    mapped, total = sublong_file(
        aligner, args.reads, args.output, min_windows=args.min_windows
    )
    print(
        f"// sublong: mapped {mapped}/{total} long reads in "
        f"{time.time()-t0:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
