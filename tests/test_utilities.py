"""Utility tool tests (host-only, no JAX)."""

import pathlib

import numpy as np
import pytest

DATA = pathlib.Path("/root/reference/test/featureCounts/data")

pytestmark = pytest.mark.skipif(not DATA.exists(), reason="reference data missing")


def test_propmapped(tmp_path, capsys):
    from subread_tpu.tools.utilities import propmapped

    assert propmapped(["-i", str(DATA / "test-minimum.sam")]) == 0
    out = capsys.readouterr().out
    assert "998\t998\t1.000000" in out


def test_flattengtf(tmp_path):
    from subread_tpu.tools.utilities import flattengtf

    out = tmp_path / "flat.SAF"
    assert flattengtf(["-a", str(DATA / "test-minimum.GTF"), "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "GeneID\tChr\tStart\tEnd\tStrand"
    # simu_gene2 has overlapping exons 102000-103000 and 102000-131000:
    # they must merge to 102000-131000
    g2 = [l for l in lines if l.startswith("simu_gene2")]
    assert "simu_gene2\tchr3\t102000\t131000\t+" in g2
    assert len(g2) == 2  # 100010-101000 + merged 102000-131000


def test_repair_reorders_mates(tmp_path):
    from subread_tpu.tools.utilities import repair

    # scramble the mate order
    src = DATA / "test-minimum.sam"
    scrambled = tmp_path / "scrambled.sam"
    header, recs = [], []
    for line in open(src):
        (header if line.startswith("@") else recs).append(line)
    first = [r for i, r in enumerate(recs) if i % 2 == 0]
    second = [r for i, r in enumerate(recs) if i % 2 == 1]
    scrambled.write_text("".join(header + first + second))
    out = tmp_path / "repaired.sam"
    assert repair(["-i", str(scrambled), "-o", str(out)]) == 0
    body = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    # mates adjacent: consecutive rows share qname
    for i in range(0, len(body), 2):
        assert body[i].split("\t")[0] == body[i + 1].split("\t")[0]


def test_coveragecount(tmp_path):
    from subread_tpu.tools.utilities import coveragecount

    out = tmp_path / "cov"
    assert coveragecount(["-i", str(DATA / "test-minimum.sam"), "-o", str(out)]) == 0
    arr = np.fromfile(str(out) + ".chr3.int32.bin", dtype=np.int32)
    assert len(arr) == 999950
    assert arr.sum() > 0
    # reads at chr3:271603 (100M) must produce coverage there
    assert arr[271602] >= 1


def test_fullscan(capsys):
    from subread_tpu.tools.utilities import fullscan

    seq = "TCCCCAGCATAGTCTCAAGCGAGTGGAATGACGGTTTCCT"
    assert fullscan(["-g", "/root/reference/test/chr901.fa", "-s", seq]) == 0
    out = capsys.readouterr().out
    assert "chr901\t1\t+\t100.0%" in out


def test_genrandomreads(tmp_path):
    from subread_tpu.tools.utilities import genrandomreads

    out = tmp_path / "sim"
    assert genrandomreads([
        "-g", "/root/reference/test/chr901.fa", "-o", str(out),
        "-n", "50", "-l", "80",
    ]) == 0
    lines = (tmp_path / "sim.fastq").read_text().splitlines()
    assert len(lines) == 200
    assert lines[0].startswith("@chr901_")
    assert len(lines[1]) == 80


def test_sam2fq(tmp_path):
    from subread_tpu.tools.utilities import sam2fq

    out = tmp_path / "o.fq"
    assert sam2fq(["-i", str(DATA / "test-minimum.sam"), "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 998 * 4


def test_removedup(tmp_path):
    from subread_tpu.tools.utilities import removedup

    out = tmp_path / "o.sam"
    assert removedup(["-i", str(DATA / "test-minimum.sam"), "-o", str(out), "-r", "1"]) == 0
    # r=1 removes everything mapped
    body = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert all(int(l.split("\t")[1]) & 0x4 for l in body)


def test_coord_sorted_bam_with_bai(tmp_path):
    """CoordSortBamWriter produces a sorted BAM + structurally valid BAI."""
    import struct

    from subread_tpu.io.bam import BamReader
    from subread_tpu.io.bamsort import CoordSortBamWriter
    from subread_tpu.io.sam import SamRecord

    w = CoordSortBamWriter(str(tmp_path / "s.bam"), ["c1", "c2"], [50000, 40000])
    recs = [
        ("r1", "c2", 100), ("r2", "c1", 900), ("r3", "c1", 50),
        ("r4", "c2", 20000), ("r5", "c1", 12345),
    ]
    for name, chro, pos in recs:
        w.write(SamRecord(name, 0, chro, pos, 40, "50M", seq="A" * 50,
                          qual="I" * 50))
    w.close()

    r = BamReader(str(tmp_path / "s.bam"))
    got = [(rec.qname, r.ref_names[rec.ref_id], rec.pos + 1) for rec in r]
    assert got == [
        ("r3", "c1", 50), ("r2", "c1", 900), ("r5", "c1", 12345),
        ("r1", "c2", 100), ("r4", "c2", 20000),
    ]
    bai = open(str(tmp_path / "s.bam.bai"), "rb").read()
    assert bai[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", bai, 4)
    assert n_ref == 2


def test_detectioncall_gc_annotation(tmp_path):
    """detectionCall writes per-exon rows with gene-level GC over the exon
    union, plus 2000bp background bins over intergenic gaps
    (detection-calls.c DTCparse_GTF_and_Genome/DTCanno_fill_gap)."""
    from subread_tpu.tools.utilities import detectioncall

    # 12kb contig: gene1 exons [1001,2000]+[3001,4000]; all-GC in exon1
    seq = ["A"] * 12000
    for i in range(1000, 2000):
        seq[i] = "G"
    for i in range(3000, 4000):
        seq[i] = "C" if i % 2 else "A"
    fa = tmp_path / "g.fa"
    fa.write_text(">c1\n" + "".join(seq) + "\n")
    gtf = tmp_path / "a.gtf"
    gtf.write_text(
        'c1\tx\texon\t1001\t2000\t.\t+\t0\tgene_id "g1";\n'
        'c1\tx\texon\t3001\t4000\t.\t+\t0\tgene_id "g1";\n'
        'c1\tx\texon\t1501\t2500\t.\t+\t0\tgene_id "g2";\n'
    )
    out = tmp_path / "out.txt"
    assert detectioncall(["-a", str(gtf), "-G", str(fa), "-o", str(out)]) == 0

    rows = [l.split("\t") for l in out.read_text().splitlines()[1:]]
    assert len(rows) == 3  # one row per exon feature
    g1 = [r for r in rows if r[0] == "g1"]
    # g1 union = 2000 bases, 1000 G + 500 C = 0.75
    assert abs(float(g1[0][5]) - 0.75) < 1e-4
    g2 = [r for r in rows if r[0] == "g2"][0]
    # g2 = [1501,2500]: 500 G of 1000 -> 0.5
    assert abs(float(g2[5]) - 0.5) < 1e-4

    bins = [l.split("\t") for l in (tmp_path / "out.txt-bins").read_text().splitlines()[1:]]
    assert bins and all(b[0].startswith("_fill_bin_") for b in bins)
    # gaps: [1,1000] (short: one bin) and [4001,11999] (8000bp -> 3 bins:
    # 2000+2000+3999-tail absorbing the remainder)
    first = bins[0]
    # the reference's edge fill is fill_gap(1, top_start) INCLUSIVE of the
    # first gene base (detection-calls.c:404) — replicated as-is
    assert int(first[2]) == 1 and int(first[3]) == 1001
    tail_bins = [b for b in bins if int(b[2]) >= 4001]
    assert tail_bins[0][2] == "4001"
    assert int(tail_bins[-1][3]) == 11999
    # every base of the gap is covered exactly once
    covered = sum(int(b[3]) - int(b[2]) + 1 for b in tail_bins)
    assert covered == 11999 - 4001 + 1
