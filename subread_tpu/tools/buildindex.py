"""subread-buildindex equivalent.

Reference CLI: index-builder.c:1014-1306.  Flags mirrored: -o prefix,
-F full index (gap=1; default is gapped, as upstream), -B one block, -f repeat
threshold, -M memory MB (splits the index into NN-suffixed blocks whose
votes are merged per read — the reference's block-serial voting,
core.c:3562-3613), positional FASTA file(s).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="subread_tpu-buildindex", description=__doc__
    )
    ap.add_argument("-o", "--output", required=True, help="index prefix")
    ap.add_argument("-F", "--full-index", action="store_true",
                    help="build a full index (every 16-mer); without -F a "
                         "gapped index (every 3rd 16-mer) is built, "
                         "matching the reference default "
                         "(index-builder.c:1042-1081)")
    ap.add_argument("--gapped", action="store_true",
                    help="build the gapped index (every 3rd 16-mer; "
                         "the default)")
    ap.add_argument("-B", "--one-block", action="store_true",
                    help="accepted for compatibility (always one block)")
    ap.add_argument("-M", "--memory", type=int, default=8000,
                    help="device-memory budget in MB; the index is split "
                         "into NN-suffixed blocks when it exceeds this "
                         "(index-builder.c -M)")
    ap.add_argument("-f", "--threshold", type=int, default=100,
                    help="repeat threshold for uninformative 16-mers")
    ap.add_argument("--reference-format", action="store_true",
                    help="also emit byte-exact reference-format artifacts "
                         "({prefix}.00.b.tab/.array)")
    ap.add_argument("-b", dest="ignore_bar", action="store_true",
                    help="truncate chromosome names at the first '|' "
                         "(index-builder.c:218 ignore_bar_in_seqnames)")
    ap.add_argument("-c", dest="color_space", action="store_true",
                    help="color-space index (unsupported: use the "
                         "aligner's -b read-side conversion instead)")
    ap.add_argument("-k", dest="mark_noninformative", action="store_true",
                    help=argparse.SUPPRESS)  # dead upstream: set at
                    # index-builder.c:1076 but never read in v2.0.6
    ap.add_argument("-v", "--version", action="version",
                    version="subread_tpu-buildindex")
    ap.add_argument("fasta", nargs="+", help="reference FASTA file(s)")
    args = ap.parse_args(argv)
    if args.color_space:
        print(
            "ERROR: color-space indexes are not supported; align SOLiD "
            "reads with the base-space index and 'align -b' instead.",
            file=sys.stderr,
        )
        return 1

    from ..index.build import build_hash_index
    from ..index.genome import build_genome
    from ..io.fasta import read_fasta

    t0 = time.time()
    contigs = []
    for path in args.fasta:
        contigs.extend(read_fasta(path))
    if args.ignore_bar:
        for c in contigs:
            c.name = c.name.split("|")[0]
    genome = build_genome(contigs)
    gap = 1 if args.full_index and not args.gapped else 3
    index = build_hash_index(genome, index_gap=gap, repeat_threshold=args.threshold)
    # partial index artifacts are removed on SIGINT/SIGTERM, ENOSPC or
    # any crash (reference SIGINT_hook index-builder.c:996, installed
    # :1256-1257: a half-written index must never be used)
    from ..utils.cleanup import guard

    with guard(args.output + ".genome.npz", args.output + ".reads",
               what="index"):
        genome.save(args.output)
    if args.one_block:
        with guard(args.output + ".hash.npz", what="index"):
            index.save(args.output)
    else:
        from ..index.build import split_index_blocks

        blocks = split_index_blocks(index, args.memory)
        if len(blocks) == 1:
            with guard(args.output + ".hash.npz", what="index"):
                index.save(args.output)
        else:
            with guard(*[f"{args.output}.{b:02d}.hash.npz"
                         for b in range(len(blocks))], what="index"):
                for b, blk in enumerate(blocks):
                    blk.save(f"{args.output}.{b:02d}")
            print(f"// index split into {len(blocks)} blocks (-M {args.memory})",
                  file=sys.stderr)
    if args.reference_format:
        from ..index.interop import write_reference_index

        with guard(args.output + ".tab", args.output + ".array",
                   what="index"):
            write_reference_index(genome, args.output, index_gap=gap,
                                  repeat_threshold=args.threshold)
    with open(args.output + ".log", "w") as f:
        f.write(
            f"contigs={len(genome.names)} bases={int(genome.lengths.sum())} "
            f"items={index.n_items} buckets={index.buckets_number} "
            f"gap={gap} seconds={time.time()-t0:.1f}\n"
        )
    print(
        f"Index built: {len(genome.names)} contigs, "
        f"{int(genome.lengths.sum())} bases, {index.n_items} 16-mers, "
        f"{time.time()-t0:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
