"""exactSNP CLI (reference SNPCalling.c:1583-1800)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="subread_tpu-exactSNP")
    ap.add_argument("-i", "--input", required=True, help="SAM/BAM input")
    ap.add_argument("-g", "--genome", required=True, help="reference FASTA")
    ap.add_argument("-o", "--output", required=True, help="output VCF")
    ap.add_argument("-b", "--bam", action="store_true",
                    help="input is BAM (auto-detected anyway)")
    ap.add_argument("-Q", "--min-base-quality", type=int, default=13)
    ap.add_argument("-n", "--min-alternative", type=int, default=1)
    ap.add_argument("-r", "--min-supporting", type=int, default=1)
    ap.add_argument("-f", "--supporting-rate", type=float, default=0.0)
    ap.add_argument("-x", "--test-len", type=int, default=5)
    ap.add_argument("-C", "--cutoff-multiplex", type=float, default=12.0)
    ap.add_argument("-T", "--threads", type=int, default=1)
    args = ap.parse_args(argv)

    from ..quant.snp import SNPCaller, SNPOptions

    import os
    for p in (args.input, args.genome):
        if not os.path.exists(p):
            print(f"ERROR: file not found: {p}", file=sys.stderr)
            return 1

    opts = SNPOptions(
        min_phred=args.min_base_quality,
        min_alternative=args.min_alternative,
        min_supporting=args.min_supporting,
        supporting_rate=args.supporting_rate,
        testlen=args.test_len,
        cutoff_multiplex=args.cutoff_multiplex,
    )
    caller = SNPCaller(args.genome, opts)
    caller.add_sam(args.input)
    stats = caller.write_vcf(
        args.output, cmdline=" ".join(argv or sys.argv[1:])
    )
    print(
        f"// exactSNP: {stats['snps']} SNPs, {stats['indels']} indels "
        f"-> {args.output}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
