"""cellCounts pipeline test on simulated scRNA data over chr901."""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from subread_tpu import dna


def test_barcode_matcher():
    from subread_tpu.quant.cellcounts import BarcodeMatcher

    m = BarcodeMatcher(["AAACCCAAGAAACACT", "AAACCCAAGAAACCAT"])
    assert m.match("AAACCCAAGAAACACT") == 0
    # hamming-1 rescue
    assert m.match("TAACCCAAGAAACACT") == 0
    # ambiguous between the two -> dropped; (distance 1 to both)
    assert m.match("AAACCCAAGAAACCCT") == -1
    # hamming 2 -> no match
    assert m.match("TTACCCAAGAAACACT") == -1


def test_umi_merge():
    from subread_tpu.quant.cellcounts import hamming1_umi_merge

    merged = hamming1_umi_merge({"AAAAAAAAAA": 5, "AAAAAAAAAT": 1, "GGGGGGGGGG": 2})
    assert merged == {"AAAAAAAAAA": 6, "GGGGGGGGGG": 2}


def test_cellcounts_end_to_end(tmp_path, chr901_genome, chr901_index, rng):
    from subread_tpu.tools.cellcounts import main

    g = chr901_genome
    # fabricate a 3-gene annotation over chr901
    gtf = tmp_path / "genes.gtf"
    genes = [("geneA", 1000, 50000), ("geneB", 300000, 360000), ("geneC", 700000, 760000)]
    with open(gtf, "w") as f:
        for name, s, e in genes:
            f.write(
                f"chr901\tsim\texon\t{s}\t{e}\t.\t+\t0\tgene_id \"{name}\";\n"
            )
    barcodes = ["AAACCCAAGAAACACT", "TTTGGGTTCTTTGTGA", "CCCAAACCTCCCACAC"]
    wl = tmp_path / "barcodes.txt"
    wl.write_text("\n".join(barcodes) + "\n")

    # simulate: 300 cDNA reads from the gene regions + barcode/UMI R1s
    n = 300
    r1_path, r2_path = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(r1_path, "w") as f1, open(r2_path, "w") as f2:
        for i in range(n):
            gene = genes[i % 3]
            cell = barcodes[i % 3]
            umi = dna.decode(rng.integers(0, 4, size=10).astype(np.uint8))
            pos = int(rng.integers(gene[1], gene[2] - 101))
            lin = g.chro_to_linear(0, pos - 1)
            seq = dna.decode(g.codes[lin : lin + 100])
            f1.write(f"@r{i}\n{cell}{umi}\n+\n{'I' * 26}\n")
            f2.write(f"@r{i}\n{seq}\n+\n{'I' * 100}\n")

    # save index for the CLI
    prefix = str(tmp_path / "idx")
    chr901_genome.save(prefix)
    chr901_index.save(prefix)

    out = tmp_path / "counts"
    assert main([
        "-i", prefix, "-r", str(r1_path), "-R", str(r2_path),
        "-a", str(gtf), "-c", str(wl), "-o", str(out),
    ]) == 0

    feats = (out / "features.tsv").read_text().splitlines()
    cells = (out / "barcodes.tsv").read_text().splitlines()
    assert len(feats) == 3
    assert set(cells) <= set(barcodes)
    mtx = (out / "matrix.mtx").read_text().splitlines()
    n_genes, n_cells, n_entries = map(int, mtx[1].split())
    assert n_genes == 3 and n_cells == len(cells)
    total = sum(int(l.split()[2]) for l in mtx[2:])
    # most reads should be counted (unique UMIs, mapped, assigned)
    assert total > 0.8 * n
    # each cell sees exactly one gene in this simulation
    gene_of_cell = {}
    for l in mtx[2:]:
        gi, ci, cnt = map(int, l.split())
        assert gene_of_cell.setdefault(ci, gi) == gi


def test_cellcounts_bcl_mode(tmp_path, chr901_genome, chr901_index, rng):
    """BCL-mode end-to-end: synthetic CBCL run + rawdir sample sheet ->
    demultiplexed per-sample matrices (cell-counts.c --inputMode BCL)."""
    from subread_tpu.io.bcl import ReadSegment, write_synthetic_run
    from subread_tpu.tools.cellcounts import main

    g = chr901_genome
    gtf = tmp_path / "genes.gtf"
    genes = [("geneA", 1000, 50000), ("geneB", 300000, 360000)]
    with open(gtf, "w") as f:
        for name, s, e in genes:
            f.write(
                f"chr901\tsim\texon\t{s}\t{e}\t.\t+\t0\tgene_id \"{name}\";\n"
            )
    barcodes = ["AAACCCAAGAAACACT", "TTTGGGTTCTTTGTGA"]
    wl = tmp_path / "barcodes.txt"
    wl.write_text("\n".join(barcodes) + "\n")
    indices = {"sampleA": "ACGTACGT", "sampleB": "TTTTCCCC"}
    sheet = tmp_path / "sheet.csv"
    sheet.write_text(
        "[Data]\nLane,Sample_ID,Sample_Name,index\n"
        "*,S1,sampleA,ACGTACGT\n*,S2,sampleB,TTTTCCCC\n"
    )

    segments = [ReadSegment(26, False), ReadSegment(8, True), ReadSegment(100, False)]
    n = 120
    reads = []
    for i in range(n):
        sample = "sampleA" if i % 2 == 0 else "sampleB"
        gene = genes[i % 2]
        cell = barcodes[i % 2]
        umi = dna.decode(rng.integers(0, 4, size=10).astype(np.uint8))
        pos = int(rng.integers(gene[1], gene[2] - 101))
        lin = g.chro_to_linear(0, pos - 1)
        seq = dna.decode(g.codes[lin : lin + 100])
        reads.append((cell + umi, indices[sample], seq))
    run = str(tmp_path / "run")
    write_synthetic_run(run, {1: reads}, segments, mode="cbcl", tiles_per_lane=2)

    prefix = str(tmp_path / "idx")
    chr901_genome.save(prefix)
    chr901_index.save(prefix)
    out = tmp_path / "counts"
    assert main([
        "-i", prefix, "--inputMode", "BCL", "--dataset", run,
        "--sampleSheetFile", str(sheet), "-a", str(gtf), "-c", str(wl),
        "-o", str(out),
    ]) == 0

    from subread_tpu.io.bam import BamReader

    for sample, gene_i in (("sampleA", 1), ("sampleB", 2)):
        mtx = (out / sample / "matrix.mtx").read_text().splitlines()
        cells = (out / sample / "barcodes.tsv").read_text().splitlines()
        assert cells == [barcodes[0] if sample == "sampleA" else barcodes[1]]
        total = sum(int(l.split()[2]) for l in mtx[2:])
        assert total > 0.8 * (n // 2)
        for l in mtx[2:]:
            gi, ci, cnt = map(int, l.split())
            assert gi == gene_i  # each sample sees only its gene
        # per-sample BAM with CB/UB/GX tags (cell-counts.c per-sample output)
        bam = out / sample / f"{sample}.bam"
        assert bam.exists()
        recs = list(BamReader(str(bam)))
        assert len(recs) == n // 2
        want_cb = barcodes[0] if sample == "sampleA" else barcodes[1]
        n_cb = sum(1 for r in recs if r.tags.get("CB") == want_cb + "-1")
        assert n_cb == n // 2
        assert any("GX" in r.tags for r in recs)


def test_cell_calling_knee_and_rescue():
    """Bootstrap knee point + ambient rescue (cell-counts.c:4330-4430)."""
    from subread_tpu.quant.cellcounts import call_cells

    # 50 real cells at ~10000 UMIs, 900 ambient barcodes at ~40
    rng = np.random.default_rng(3)
    umis = {}
    for i in range(50):
        umis[i] = int(10000 + rng.integers(0, 2000))
    for i in range(50, 950):
        umis[i] = int(rng.integers(10, 70))
    # two mid barcodes above the 1%-median + 500 floor -> rescue candidates
    umis[950] = 600
    umis[951] = 520
    called, rescued, cutoff = call_cells(umis)
    assert set(called) == set(range(50)), (len(called), sorted(called)[:5])
    assert set(rescued) == {950, 951}
    assert cutoff >= 10000

    # fixed cutoff override (--umiCutoff)
    called2, _r, cut2 = call_cells(umis, umi_cutoff=500)
    assert set(called2) == set(range(50)) | {950, 951}


def test_batch_counter_matches_scalar():
    """BatchCellCounter/BatchBarcodeMatcher (vectorised packed-triple
    accumulation + array finalise) produce the same matrix, cells and
    stats as the scalar per-read path, including hamming<=1 barcode
    rescue and UMI merging."""
    import numpy as np

    from subread_tpu.quant.cellcounts import (
        BarcodeMatcher, BatchBarcodeMatcher, BatchCellCounter, CellCounter,
    )

    rng = np.random.default_rng(17)
    barcodes = ["".join(rng.choice(list("ACGT"), 16)) for _ in range(200)]
    m = {"A": 0, "G": 1, "C": 2, "T": 3}
    wl = np.array([[m[c] for c in b] for b in barcodes], np.uint8)
    n = 5000
    r1 = np.zeros((n, 26), np.uint8)
    r1[:, :16] = wl[rng.integers(0, 200, n)]
    r1[:, 16:] = rng.integers(0, 4, (n, 10))
    mut = rng.random(n) < 0.1
    pp = rng.integers(0, 16, n)
    r1[mut, pp[mut]] = rng.integers(0, 4, n)[mut]
    gene = rng.integers(-1, 30, n).astype(np.int32)
    genes = [f"g{i}" for i in range(30)]

    dec = "AGCT"
    a = CellCounter(BarcodeMatcher(barcodes), genes, umi_len=10)
    for i in range(n):
        a.add("".join(dec[x] for x in r1[i]), int(gene[i]))
    b = BatchCellCounter(BatchBarcodeMatcher(barcodes), genes, umi_len=10)
    b.add_batch(r1, gene)
    e1, c1 = a.finalise()
    e2, c2 = b.finalise()
    assert a.stats == b.stats
    assert c1 == c2
    assert np.array_equal(np.asarray(e1).reshape(-1, 3),
                          np.asarray(e2).reshape(-1, 3))


def test_cellcounts_reference_parity(tmp_path, chr901_genome, chr901_index):
    """Pinned fixture vs the compiled reference cell-counts binary
    (cell-counts.c:4430-4500): tests/data/cellcounts-ref holds the
    verbatim outputs of `cell-counts --inputMode FASTQ` on 400 synthetic
    10X reads (8 genes x 4 cells, 12bp UMIs).  Our CLI in sample-sheet
    mode must reproduce the artifact set: .Annot byte-equal, SampleTable
    totals, GENEtab/BCtab sets, and per-(barcode,gene) HighConf UMI
    counts — within 1 everywhere (the reference leaves one dup-block
    geneH read unmapped that the exonic-weight rescoring maps for us)."""
    import gzip
    import pathlib

    from subread_tpu.tools.cellcounts import main

    here = pathlib.Path(__file__).parent / "data" / "cellcounts-ref"
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    r1.write_bytes(gzip.open(here / "cc_r1.fq.gz").read())
    r2.write_bytes(gzip.open(here / "cc_r2.fq.gz").read())
    prefix = str(tmp_path / "idx")
    chr901_genome.save(prefix)
    chr901_index.save(prefix)
    out = str(tmp_path / "cc_ours")
    assert main([
        "-i", prefix, "-r", str(r1), "-R", str(r2),
        "-a", str(here / "cc_genes.gtf"), "--isGTFannotation",
        "-c", str(here / "cc_barcodes.txt"),
        "--sampleSheetFile", str(here / "cc_sheet.csv"),
        "--umi-len", "12", "-o", out,
    ]) == 0

    # .Annot byte-equality
    assert (tmp_path / "cc_ours.Annot").read_text() == \
        (here / "cc_out.Annot").read_text()
    # SampleTable: same sample, all 400 reads mapped and assigned
    # (ref: 399 — it leaves one geneH read unmapped; the annotation-
    # weighted candidate rescoring resolves every dup-block tie to the
    # annotated copy, cell-counts.c:1535 cellCounts_calculate_pos_weight)
    ours = (tmp_path / "cc_ours.scRNA.SampleTable").read_text().splitlines()
    ref = (here / "cc_out.scRNA.SampleTable").read_text().splitlines()
    assert ours[0] == ref[0]
    of, rf = ours[1].split("\t"), ref[1].split("\t")
    assert of[0] == rf[0] == "SampleA"
    assert int(of[2]) == int(rf[2]) == 400
    assert int(of[3]) >= 399 and int(of[4]) >= 399

    def load(base):
        bcs = [l.strip() for l in open(f"{base}.BCtab")]
        genes = [l.strip() for l in open(f"{base}.GENEtab")]
        d = {}
        for l in list(open(f"{base}.spmtx"))[2:]:
            g, c, n = map(int, l.split())
            d[(bcs[c - 1], genes[g - 1])] = n
        return set(bcs), genes, d

    obc, ogenes, od = load(str(tmp_path / "cc_ours.scRNA.001.HighConf"))
    rbc, rgenes, rd = load(str(here / "cc_out.scRNA.001.HighConf"))
    assert ogenes == rgenes          # GENEtab lists ALL genes, same order
    assert obc == rbc                # same called cells
    assert set(od) == set(rd)        # same nonzero (cell, gene) pairs
    for k in rd:
        assert abs(od[k] - rd[k]) <= 1, (k, od[k], rd[k])
