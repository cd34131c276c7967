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
