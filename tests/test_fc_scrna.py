"""featureCounts scRNA sub-mode (--scSampleSheet/--scInputMode/
--scCellBarcodeFile, readSummary.c:7332-7334 + scRNA_merged_* writers).

No reference-binary golden here: the reference v2.0.6 standalone CLI
segfaults on this mode with synthetic input (it is exercised only through
Rsubread's cellCounts wrapper); outputs are validated by construction.
"""

import pathlib
import random

import pytest

SAF = pathlib.Path("/root/reference/test/featureCounts/data/test-minimum.SAF")
SAM = pathlib.Path("/root/reference/test/featureCounts/data/test-minimum.sam")


@pytest.fixture(scope="module")
def scrna_fixture(tmp_path_factory):
    """SE BAM whose read names carry '|'-joined barcode+UMI, plus a
    barcode whitelist and a sample sheet."""
    if not SAM.exists():
        pytest.skip("reference fixture missing")
    from subread_tpu.io.bam import BamWriter

    d = tmp_path_factory.mktemp("scrna")
    rng = random.Random(7)
    bases = "ACGT"
    barcodes = [
        "".join(rng.choice(bases) for _ in range(16)) for _ in range(8)
    ]
    (d / "barcodes.txt").write_text("\n".join(barcodes) + "\n")
    (d / "sheet.csv").write_text(
        "IEMFileVersion,4\n[Data]\nLane,Sample_ID,Sample_Name,index\n"
        "1,S1,SampleA,ACGTACGT\n"
    )
    refs, lens, hdr, recs = [], [], [], []
    names = {}
    truth = {}  # qname -> (barcode_index, umi)
    for line in open(SAM):
        if line.startswith("@"):
            hdr.append(line)
            if line.startswith("@SQ"):
                kv = dict(x.split(":", 1) for x in line.rstrip().split("\t")[1:])
                refs.append(kv["SN"]); lens.append(int(kv["LN"]))
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x1 and not (flag & 0x40):
            continue  # SE: keep first-in-pair only
        if f[0] not in names:
            bi = rng.randrange(len(barcodes))
            bc = barcodes[bi]
            if rng.random() < 0.2:  # hamming-1 rescue cases
                p = rng.randrange(16)
                bc = bc[:p] + rng.choice(bases.replace(bc[p], "")) + bc[p + 1:]
            umi = "".join(rng.choice(bases) for _ in range(10))
            names[f[0]] = f"{f[0]}|{bc}{umi}|{'I' * 26}|ACGTACGT|IIII|L001"
            truth[f[0]] = (bi, umi)
        f[0] = names[f[0]]
        f[1] = str(flag & 0x10)
        f[6], f[7], f[8] = "*", "0", "0"
        recs.append(f)
    w = BamWriter(str(d / "sc.bam"), refs, lens, header_text="".join(hdr))
    for f in recs:
        w.add_sam_fields(f)
    w.close()
    return d, barcodes, len(recs)


def test_scrna_submode_outputs(scrna_fixture, tmp_path):
    from subread_tpu.tools.featurecounts import main

    d, barcodes, n_reads = scrna_fixture
    bam = str(d / "sc.bam")
    assert main([
        "-F", "SAF", "-a", str(SAF), "-o", str(tmp_path / "out.FC"),
        "--scSampleSheet", str(d / "sheet.csv"), "--scInputMode", "BAM",
        "--scCellBarcodeFile", str(d / "barcodes.txt"), bam,
    ]) == 0
    st = open(bam + ".scRNA.SampleTable").read().splitlines()
    assert st[0] == ("SampleName\tUMICutoff\tTotalReads\tMappedReads"
                     "\tAssignedReads\tIndex")
    name, cutoff, total, mapped, assigned, idx = st[1].split("\t")
    assert name == "SampleA" and idx == "1"
    assert int(total) == n_reads
    assert 0 < int(assigned) <= int(mapped) <= int(total)
    # the high-confidence matrix is consistent: header counts match body
    mtx = open(bam + ".scRNA.001.HighConf.spmtx").read().splitlines()
    n_genes, n_cells, n_umis = map(int, mtx[1].split())
    body = [tuple(map(int, l.split())) for l in mtx[2:]]
    assert sum(v for _, _, v in body) == n_umis
    assert len(open(bam + ".scRNA.001.HighConf.BCtab").read().split()) == n_cells
    assert len(open(bam + ".scRNA.001.HighConf.GENEtab").read().split()) == n_genes
    assert all(1 <= g <= n_genes and 1 <= c <= n_cells for g, c, _ in body)
    # every barcode in BCtab is from the whitelist
    for b in open(bam + ".scRNA.001.HighConf.BCtab").read().split():
        assert b in barcodes
    # no0Genes lists every gene with >=1 UMI
    no0 = open(bam + ".scRNA.001.no0Genes").read().split()
    assert len(no0) >= n_genes
    # normal featureCounts outputs still written alongside
    assert (tmp_path / "out.FC").exists()
    assert (tmp_path / "out.FC.summary").exists()


def test_scrna_read_name_split():
    from subread_tpu.quant.fc_scrna import split_scrna_read_name

    t, bc, umi, ss, lane = split_scrna_read_name(
        "r1|ACGTACGTACGTACGTTTTTTTTTTT|IIII|SAMPLE|QQQQ|L001", 16
    )
    assert t == "r1" and bc == "ACGTACGTACGTACGT" and umi == "TTTTTTTTTT"
    assert ss == "SAMPLE" and lane == "L001"
    t, bc, umi, ss, lane = split_scrna_read_name("plain_name", 16)
    assert t == "plain_name" and bc is None and umi is None
