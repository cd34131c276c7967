"""subindel long-indel reassembly from soft-clipped alignments."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from subread_tpu import dna


def test_long_deletion_and_insertion_reassembly(tmp_path, chr901_genome):
    from subread_tpu.tools.subindel import main

    g = chr901_genome
    lin = g.chro_to_linear(0, 300000)
    seq = lambda a, b: dna.decode(g.codes[a:b])
    fa = tmp_path / "g.fa"
    # write only chr901 region? subindel loads the whole FASTA; reuse ref
    fa = "/root/reference/test/chr901.fa"

    DEL, INS = 60, 25
    ins_seq = "ACGTTGCAACGTTGCAACGTTGCAA"[:INS]
    sam = tmp_path / "in.sam"
    with open(sam, "w") as f:
        f.write("@SQ\tSN:chr901\tLN:999950\n")
        # deletion reads: 60M40S where the 40S tail matches genome 60bp later
        for i in range(5):
            start = 300001 - 10 * i  # 1-based contig
            a = g.chro_to_linear(0, start - 1)
            read = seq(a, a + 60 + 10 * i) + seq(
                a + 60 + 10 * i + DEL, a + 100 + 10 * i + DEL
            )
            m = 60 + 10 * i
            f.write(
                f"d{i}\t0\tchr901\t{start}\t40\t{m}M{100 - m}S\t*\t0\t0\t"
                f"{read}\t{'I' * 100}\n"
            )
        # insertion reads: tail starts with the inserted bases
        for i in range(5):
            start = 500001 - 10 * i
            a = g.chro_to_linear(0, start - 1)
            m = 50 + 10 * i
            read = seq(a, a + m) + ins_seq + seq(a + m, a + 100 - INS - m + m)
            read = read[:100]
            f.write(
                f"i{i}\t0\tchr901\t{start}\t40\t{m}M{100 - m}S\t*\t0\t0\t"
                f"{read}\t{'I' * 100}\n"
            )
    out = tmp_path / "out.vcf"
    assert main(["-i", str(sam), "-g", fa, "-o", str(out), "-n", "2"]) == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    dels = [r for r in recs if len(r[3]) - len(r[4]) == DEL]
    assert dels, recs
    assert abs(int(dels[0][1]) - 300060) <= 2
    ins = [r for r in recs if len(r[4]) - len(r[3]) == INS]
    assert ins, recs
    assert abs(int(ins[0][1]) - 500050) <= 2
    assert ins[0][4][1:] == ins_seq or ins[0][4][:-1].endswith(ins_seq[:-1])
