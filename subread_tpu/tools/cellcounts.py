"""cellCounts CLI (reference cell-counts.c:4853, FASTQ input mode)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="subread_tpu-cellCounts")
    ap.add_argument("-i", "--index", required=True, help="index prefix")
    ap.add_argument("-r", "--reads", required=True,
                    help="R1 FASTQ (cell barcode + UMI)")
    ap.add_argument("-R", "--reads2", required=True, help="R2 FASTQ (cDNA)")
    ap.add_argument("-a", "--annotation", required=True, help="GTF/SAF")
    ap.add_argument("-F", "--anno-format", default="GTF", choices=["GTF", "SAF"])
    ap.add_argument("-c", "--cell-barcodes", required=True,
                    help="cell barcode whitelist (one per line)")
    ap.add_argument("-o", "--output", required=True, help="output directory")
    ap.add_argument("--umi-len", type=int, default=10)
    args = ap.parse_args(argv)

    import numpy as np

    from ..align.pipeline import Aligner
    from ..config import subjunc_config
    from ..index.build import HashIndex
    from ..index.genome import Genome
    from ..io.fastq import FastqReader
    from ..io.gtf import load_annotation
    from ..quant.cellcounts import BarcodeMatcher, CellCounter
    from ..quant.featurecounts import FCOptions, FeatureCounter, _ChromIndex
    from .. import dna

    from .align import load_index_any

    genome, index = load_index_any(args.index)
    ann = load_annotation(args.annotation, fmt=args.anno_format)
    whitelist = [l.strip() for l in open(args.cell_barcodes) if l.strip()]
    matcher = BarcodeMatcher(whitelist)
    counter = CellCounter(matcher, ann.gene_names, umi_len=args.umi_len)
    fcview = FeatureCounter(ann, FCOptions())  # reuse its interval index

    aligner = Aligner(genome, index, subjunc_config(batch_reads=2048))

    r1 = FastqReader(args.reads)
    r2 = FastqReader(args.reads2)
    while True:
        b1 = r1.next_batch(1 << 16)
        b2 = r2.next_batch(1 << 16, pad_to=aligner.cfg.pad_read_len)
        if b1 is None or b2 is None:
            break
        res = aligner.align_batch(b2)
        lin = res["pos"].astype(np.int64)
        cidx, coff = genome.linear_to_chro(lin)
        for i in range(len(b1)):
            gene_idx = -1
            if res["mapped"][i]:
                chro = genome.names[int(cidx[i])]
                ci = fcview.by_chrom.get(chro)
                if ci is not None:
                    s = int(coff[i]) + 1
                    e = s + int(b2.lengths[i]) - 1
                    hits = {
                        int(fcview.feat_target[int(ci.feat_idx[j])])
                        for j in ci.query(s, e)
                    }
                    if len(hits) == 1:
                        gene_idx = hits.pop()
            L1 = int(b1.lengths[i])
            counter.add(dna.decode(b1.codes[i, :L1]), gene_idx)
    r1.close()
    r2.close()
    counter.write_matrix(args.output)
    print(
        f"// cellCounts: {counter.stats['reads']} reads, "
        f"{counter.stats['barcode_matched']} barcode-matched, "
        f"{counter.stats['assigned']} assigned -> {args.output}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
