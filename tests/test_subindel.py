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


def test_long_deletion_from_two_sided_clips(tmp_path, chr901_genome):
    """A 20bp deletion leaving right-clipped reads on the left flank and
    left-clipped reads on the right flank is reconstructed (the reference
    binary reports the same event at its anchor-1 convention)."""
    import numpy as np

    from subread_tpu.tools.subindel import main

    g = chr901_genome
    codes = np.asarray(g.codes)
    rng = np.random.default_rng(31)
    D = 50_000
    recs = ["@HD\tVN:1.0\tSO:unsorted", "@SQ\tSN:chr901\tLN:999950"]
    for i in range(60):
        off = int(rng.integers(10, 50))
        read = np.concatenate([
            codes[1210 + D - off : 1210 + D],
            codes[1210 + D + 20 : 1210 + D + 20 + (100 - off)],
        ])
        s = "".join("AGCT"[c] for c in read)
        recs.append(
            f"delA{i}\t0\tchr901\t{D - off + 1}\t40\t{off}M{100 - off}S"
            f"\t*\t0\t0\t{s}\t{'I' * 100}"
        )
        off2 = int(rng.integers(10, 50))
        read2 = np.concatenate([
            codes[1210 + D - (100 - off2) : 1210 + D],
            codes[1210 + D + 20 : 1210 + D + 20 + off2],
        ])
        s2 = "".join("AGCT"[c] for c in read2)
        recs.append(
            f"delB{i}\t0\tchr901\t{D + 20 + 1}\t40\t{100 - off2}S{off2}M"
            f"\t*\t0\t0\t{s2}\t{'I' * 100}"
        )
    sam = tmp_path / "in.sam"
    sam.write_text("\n".join(recs) + "\n")
    out = tmp_path / "out.vcf"
    assert main(["-i", str(sam), "-g", "/root/reference/test/chr901.fa",
                 "-o", str(out), "-I", "50"]) == 0
    rows = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(rows) == 1
    assert int(rows[0][1]) == 50_000
    assert len(rows[0][3]) - len(rows[0][4]) == 20  # 20bp deletion
    assert "SR=60" in rows[0][7]


def test_long_insertion_reassembly_vs_reference(tmp_path, chr901_genome,
                                                chr901_index):
    """A 24bp insertion (simulated sample, 40x coverage) must come out of
    BOTH long-indel surfaces — the aligner's -I 30 third iteration and the
    subindel SAM caller — as ONE left-normalized event whose inserted
    sequence matches the reference binary's reassembled event
    (tests/data/longins24-chr901.ref-indel.vcf, generated with a locally
    built subread-align -I 30: the binary reports the identical 24 inserted
    bases, anchored one base left by its reassembly-window edge —
    finalise_long_insertions, core-indel.c:4389)."""
    import pathlib
    import re

    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    here = pathlib.Path(__file__).parent
    fq = here / "data" / "longins24-chr901.fq.gz"
    refvcf = here / "data" / "longins24-chr901.ref-indel.vcf"
    # the reference binary's inserted bases
    ref_ins = None
    for line in open(refvcf):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if len(f[4]) - len(f[3]) >= 20:
            ref_ins = f[4][len(f[3]) - 1 : -1] if f[4].endswith(f[3][-1]) \
                else f[4][1:]
            ref_pos = int(f[1])
    assert ref_ins and len(ref_ins) == 24

    import dataclasses

    cfg = dataclasses.replace(
        aligner_config(batch_reads=2048), max_indel=30
    )
    al = Aligner(chr901_genome, chr901_index, cfg)
    out = tmp_path / "ours.sam"
    al.align_file(str(fq), str(out))
    vcf = str(out) + ".indel.vcf"
    long_ins = []
    for line in open(vcf):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if len(f[4]) - len(f[3]) >= 20:
            long_ins.append((int(f[1]), f[4][1:], line))
    assert len(long_ins) == 1, long_ins   # normalization merged rotations
    pos, ins, _ = long_ins[0]
    assert ins == ref_ins, (ins, ref_ins)
    assert abs(pos - ref_pos) <= 2, (pos, ref_pos)

    # subindel over the emitted SAM reproduces the same single event
    from subread_tpu.tools.subindel import main as subindel_main

    gpfx = tmp_path / "idx"
    chr901_genome.save(str(gpfx))
    chr901_index.save(str(gpfx))
    out2 = tmp_path / "sub.vcf"
    assert subindel_main(["-g", "/root/reference/test/chr901.fa",
                          "-i", str(out), "-o", str(out2),
                          "-I", "30"]) == 0
    long2 = [l for l in open(out2)
             if not l.startswith("#")
             and len(l.split("\t")[4]) - len(l.split("\t")[3]) >= 20]
    assert len(long2) == 1, long2
    assert ref_ins in long2[0]
