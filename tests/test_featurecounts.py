"""featureCounts golden tests against the reference's bundled .ora oracles
(test/featureCounts/test_corner_cases.sh ports).  Pure host code: no JAX."""

import pathlib
import subprocess
import sys

import pytest

DATA = pathlib.Path("/root/reference/test/featureCounts/data")

pytestmark = pytest.mark.skipif(not DATA.exists(), reason="reference data missing")


def run_fc(tmp_path, sam, ora, anno, extra_args, feature_level=False):
    out = tmp_path / "out.FC"
    fmt = "SAF" if anno.endswith(".SAF") else "GTF"
    argv = [
        "-a", str(DATA / anno), "-o", str(out), "-F", fmt,
        *extra_args, str(DATA / sam),
    ]
    from subread_tpu.tools.featurecounts import main

    assert main(argv) == 0

    # parse oracle: gene-level = {geneid: count}; feature-level keyed by
    # (geneid, chr, start) — the compare.sh awk logic
    ora_counts = {}
    for line in open(DATA / ora):
        if line.startswith("#") or line.lower().startswith("geneid"):
            continue
        f = line.split()
        if feature_level:
            if len(f) == 5:
                ora_counts[(f[0], f[1], f[2])] = float(f[4])
        else:
            if len(f) == 2:
                ora_counts[f[0]] = float(f[1])

    ours = {}
    for line in open(out):
        if line.startswith("#") or line.lower().startswith("geneid"):
            continue
        f = line.rstrip("\n").split("\t")
        if feature_level:
            ours[(f[0], f[1], f[2])] = float(f[6])
        else:
            ours[f[0]] = float(f[6])

    assert set(ora_counts) == set(ours), (
        f"row sets differ: only_ora={set(ora_counts)-set(ours)} "
        f"only_ours={set(ours)-set(ora_counts)}"
    )
    diffs = {k: (ora_counts[k], ours[k]) for k in ora_counts if ora_counts[k] != ours[k]}
    assert not diffs, f"count mismatches: {diffs}"
    return out


PAIRED = ["-p", "--countReadPairs"]

CASES = [
    ("corner-INDEL.sam", "corner-INDEL.ora", "test-minimum.GTF", PAIRED, False),
    ("corner-JUNC.sam", "corner-JUNC.ora", "test-minimum.GTF", PAIRED, False),
    ("corner-ONEEND.sam", "corner-ONEEND.ora", "test-minimum.GTF", PAIRED, False),
    ("corner-ONEEND.sam", "corner-ONEEND-BOTH.ora", "test-minimum.GTF", PAIRED + ["-B"], False),
    ("test-minimum.sam", "test-minimum-O.ora", "test-minimum.GTF", PAIRED + ["-O"], False),
    ("test-minimum.sam", "test-minimum-FL.ora", "test-minimum.GTF", PAIRED + ["-f"], True),
    ("test-minimum.sam", "test-minimum.ora", "test-minimum.GTF", PAIRED, False),
    ("corner-NH.sam", "corner-NH.ora", "test-minimum.GTF", PAIRED, False),
    ("corner-NH.sam", "corner-NH-PM.ora", "test-minimum.GTF", PAIRED + ["--primary", "-M"], False),
    ("test-junc.sam", "corner-BothEnds.ora", "test-minimum.SAF", PAIRED + ["-B"], False),
    ("test-junc.sam", "corner-Chimeric.ora", "test-minimum.SAF", PAIRED + ["-C"], False),
    ("test-junc.sam", "corner-MultiMapping.ora", "test-minimum.SAF", PAIRED + ["-M"], False),
    ("test-junc.sam", "corner-MinOverlap.ora", "test-minimum.SAF", ["--minOverlap", "125"] + PAIRED, False),
    ("test-fracOverlap.sam", "test-fracOverlap.ora", "corner-fractions.SAF", ["--fracOverlap", "0.62", "-O"] + PAIRED, False),
    ("test-junc.sam", "corner-LargestOverlap.ora", "test-minimum.SAF", PAIRED + ["--largestOverlap"], False),
    ("test-junc.sam", "corner-PEdist.ora", "test-minimum.SAF", PAIRED + ["-B", "-C", "-P", "-d", "130", "-D", "770"], False),
    ("test-junc.sam", "corner-Read2Pos5.ora", "test-minimum.SAF", PAIRED + ["--read2pos", "5"], False),
    ("test-junc.sam", "corner-Read2Pos3.ora", "test-minimum.SAF", PAIRED + ["--read2pos", "3"], False),
    ("test-junc.sam", "corner-Extend3.ora", "test-minimum.SAF", PAIRED + ["--readExtension3", "1000"], False),
    ("test-junc.sam", "corner-Extend5.ora", "test-minimum.SAF", PAIRED + ["--readExtension5", "1000"], False),
    ("test-junc.sam", "corner-MaxOPs.ora", "test-minimum.SAF", PAIRED + ["--maxMOp", "2"], False),
    ("test-junc.sam", "corner-MinMAPQ.ora", "test-minimum.SAF", PAIRED + ["-Q", "58"], False),
    ("test-dup.sam", "corner-IgnoreDup.ora", "test-minimum.SAF", PAIRED + ["--ignoreDup"], False),
    ("test-junc.sam", "corner-Fraction.ora", "test-minimum.SAF", PAIRED + ["--fraction", "-M"], False),
    ("corner-fractions.sam", "corner-fractions.ora", "corner-fractions.SAF", ["-O", "-M", "--fraction"], False),
    ("test-minimum.sam", "test-minimum.ora", "test-minimum.SAF", PAIRED, False),
    ("test-minimum.sam", "test-minimum.ora", "test-minimum.GTF", PAIRED + ["-s", "0"], False),
    ("test-minimum.sam", "test-minimum-STR.ora", "test-minimum.GTF", PAIRED + ["-s", "1"], False),
    ("test-minimum.sam", "test-minimum-UNSTR.ora", "test-minimum.GTF", PAIRED + ["-s", "2"], False),
    ("test-chrname.sam", "test-minimum-dup.ora", "test-minimum.GTF", PAIRED + ["--ignoreDup"], False),
    ("corner-JUNC.sam", "corner-JUNC-ONLY.ora", "test-minimum.GTF", ["-p", "--splitOnly", "-O", "-f"], True),
    ("corner-JUNC.sam", "corner-EXON-ONLY.ora", "test-minimum.GTF", ["--nonSplitOnly"] + PAIRED, False),
]


@pytest.mark.parametrize(
    "sam,ora,anno,args,fl",
    CASES,
    ids=[f"{c[1]}" for c in CASES],
)
def test_corner_case(tmp_path, sam, ora, anno, args, fl):
    if not (DATA / sam).exists() or not (DATA / ora).exists():
        pytest.skip("fixture missing")
    run_fc(tmp_path, sam, ora, anno, args, feature_level=fl)


def test_chr_aliases(tmp_path):
    """-A alias CSV (test_chr_aliases.sh port)."""
    if not (DATA / "test-chralias.sam").exists():
        pytest.skip("fixture missing")
    run_fc(
        tmp_path, "test-chralias.sam", "test-chralias.ora", "test-chralias.SAF",
        ["--countReadPairs", "-p", "-A", str(DATA / "test-chralias.txt")],
    )


def test_chr_inference(tmp_path):
    """automatic chromosome-name inference (test_chr_inference.sh port)."""
    if not (DATA / "test-chrname.sam").exists():
        pytest.skip("fixture missing")
    run_fc(
        tmp_path, "test-chrname.sam", "test-chrname.ora", "test-chrname.SAF",
        ["-p", "--countReadPairs"],
    )


@pytest.mark.parametrize("sam", [
    "across_genes_r1.sam", "across_genes_r2.sam",
    "across_intron_r1.sam", "across_intron_r2.sam",
])
def test_featurelevel(tmp_path, sam):
    """feature-level -s 2 golden tests (test_featurelevel.sh port)."""
    gtf = sam.split("_r")[0] + ".gtf"
    if not (DATA / sam).exists() or not (DATA / (sam + ".ora")).exists():
        pytest.skip("fixture missing")
    run_fc(
        tmp_path, sam, sam + ".ora", gtf,
        ["-p", "-f", "--countReadPairs", "-s", "2"], feature_level=True,
    )


def test_bam_input(tmp_path):
    """BAM format input (test_corner_cases.sh BAM case)."""
    if not (DATA / "test-minimum.bam").exists():
        pytest.skip("fixture missing")
    run_fc(
        tmp_path, "test-minimum.bam", "test-minimum.ora", "test-minimum.GTF",
        ["-p", "--countReadPairs"],
    )


def test_readsummary_positional_api(tmp_path):
    """The Rsubread-shared 56-slot positional API (readSummary.c:7977)."""
    from subread_tpu.quant.featurecounts import read_summary

    D = "/root/reference/test/featureCounts/data"
    out = str(tmp_path / "rs.out")
    argv = [
        "readSummary", f"{D}/test-minimum.GTF", f"{D}/test-minimum.sam", out,
        "1", "50", "600", "1", "0", "1", "1", "1", "0", "0", "0", "0", "0",
        "exon", "gene_id", "0", "0", "", "", "0", "14", "0", "0", "1", "0",
        "0", " ", "0", "0", "0", "0", "FR", "0", "", "10", "0", "0.0", "",
        "0", "0", "0", "0", "0", "0", "-1", "-1", "0", "", "", "", "left", "0",
    ]
    assert read_summary(argv) == 0
    got = {}
    for l in open(out):
        if l.startswith("#") or l.startswith("Geneid"):
            continue
        f = l.rstrip("\n").split("\t")
        got[f[0]] = int(float(f[-1]))
    want = dict(simu_gene1=8, simu_gene2=2, simu_gene3=5, simu_gene4=1,
                simu_gene5=37, simu_gene6=15, simu_gene7=128)
    assert got == want
    assert (tmp_path / "rs.out.summary").exists()
