"""Aligner scRNA input modes (--scRNA_FQinput / --BCLinput,
core-interface-aligner.c:502-513) and the read-name synthesis of
input_mFQ_next_read (input-blc.c:1779-1848)."""

import numpy as np
import pytest


def _write_fq(path, recs):
    with open(path, "w") as f:
        for name, seq, qual in recs:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def test_mfq_name_synthesis(tmp_path):
    from subread_tpu.io.scrna import SPLIT2, ScRNAFastqReader

    _write_fq(tmp_path / "r1.fq", [
        ("b1", "ACGTACGTACGTACGTTTTTTTTTTT", "IIIIIIIIIIIIIIIIFFFFFFFFFF"),
    ])
    _write_fq(tmp_path / "i1.fq", [("i1", "ACGTACGT", "IIIIIIII")])
    _write_fq(tmp_path / "r2.fq", [("g1", "A" * 50, "J" * 50)])
    arg = SPLIT2.join(
        [str(tmp_path / "r1.fq"), str(tmp_path / "i1.fq"),
         str(tmp_path / "r2.fq")]
    )
    rd = ScRNAFastqReader(arg)
    batch = rd.next_batch(10)
    assert len(batch.names) == 1
    name = batch.names[0]
    # R%011d | BC+UMI | qual esc | sample seq | sample qual esc
    fields = name.split("|")
    assert fields[0] == "R00000000000"
    assert fields[1] == "ACGTACGTACGTACGTTTTTTTTTTT"
    # 'I' (0x49) >= '/' -> 'J'; 'F' -> 'G'
    assert fields[2] == "J" * 16 + "G" * 10
    assert fields[3] == "ACGTACGT"
    assert fields[4] == "J" * 8
    # genomic read is the third file's sequence
    assert bytes(batch.codes.shape) is not None
    assert batch.max_len >= 50


def test_mfq_no_index_file(tmp_path):
    from subread_tpu.io.scrna import SPLIT2, ScRNAFastqReader

    _write_fq(tmp_path / "r1.fq", [("b1", "ACGT" * 6, "I" * 24)])
    _write_fq(tmp_path / "r2.fq", [("g1", "C" * 40, "I" * 40)])
    arg = SPLIT2.join([str(tmp_path / "r1.fq"), "", str(tmp_path / "r2.fq")])
    rd = ScRNAFastqReader(arg)
    batch = rd.next_batch(10)
    # no index file: 4th field is input#NNNN@L999 (lane guess upstream
    # always yields 999)
    assert batch.names[0].split("|")[3] == "input#0000@L999"


def test_mfq_mismatched_files_error(tmp_path):
    from subread_tpu.io.scrna import SPLIT2, ScRNAFastqReader

    _write_fq(tmp_path / "r1.fq", [("b1", "ACGT", "IIII")])
    _write_fq(tmp_path / "r2.fq", [
        ("g1", "C" * 40, "I" * 40), ("g2", "G" * 40, "I" * 40),
    ])
    arg = SPLIT2.join([str(tmp_path / "r1.fq"), "", str(tmp_path / "r2.fq")])
    rd = ScRNAFastqReader(arg)
    with pytest.raises(ValueError):
        rd.next_batch(10)


def test_scrna_fq_align_to_fc_chain(tmp_path, chr901_genome, chr901_index,
                                    rng):
    """Full chain: scRNA FASTQ triplets -> aligner (names carry BC+UMI)
    -> BAM -> featureCounts --scSampleSheet counts per cell."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.io.scrna import SPLIT2, ScRNAFastqReader
    from subread_tpu.utils.simulate import simulate_reads

    n = 64
    batch, truth = simulate_reads(
        chr901_genome, n, read_len=100, rng=rng, error_rate=0.0
    )
    barcodes = ["".join(rng.choice(list("ACGT"), 16)) for _ in range(4)]
    r1, r2 = [], []
    for i in range(n):
        bc = barcodes[i % 4]
        umi = "".join(rng.choice(list("ACGT"), 10))
        seq = "".join("AGCT"[c] for c in batch.codes[i][: batch.lengths[i]])
        r1.append((f"r{i}", bc + umi, "I" * 26))
        r2.append((f"r{i}", seq, "I" * len(seq)))
    _write_fq(tmp_path / "r1.fq", r1)
    _write_fq(tmp_path / "r2.fq", r2)
    arg = SPLIT2.join([str(tmp_path / "r1.fq"), "", str(tmp_path / "r2.fq")])

    aligner = Aligner(
        chr901_genome, chr901_index, aligner_config(batch_reads=2048)
    )
    bam = tmp_path / "sc.bam"
    reader = ScRNAFastqReader(arg)
    summary = aligner.align_file(str(tmp_path / "r1.fq"), str(bam),
                                 reader=reader)
    d = summary.as_dict()
    # ~8% of chr901 sits in exact duplicated blocks: break-even reads
    # are dropped (reference semantics)
    assert d["mapped"] >= 0.85 * n

    # featureCounts scRNA over a whole-chromosome SAF
    saf = tmp_path / "ann.SAF"
    saf.write_text(
        "GeneID\tChr\tStart\tEnd\tStrand\n"
        f"gene_all\t{chr901_genome.names[0]}\t1\t{int(chr901_genome.lengths[0])}\t+\n"
    )
    (tmp_path / "barcodes.txt").write_text("\n".join(barcodes) + "\n")
    (tmp_path / "sheet.csv").write_text(
        "IEMFileVersion,4\n[Data]\nLane,Sample_ID,Sample_Name,index\n"
        "1,S1,SampleA,ACGTACGT\n"
    )
    from subread_tpu.tools.featurecounts import main

    assert main([
        "-F", "SAF", "-a", str(saf), "-o", str(tmp_path / "out.FC"),
        "--scSampleSheet", str(tmp_path / "sheet.csv"),
        "--scInputMode", "BAM",
        "--scCellBarcodeFile", str(tmp_path / "barcodes.txt"), str(bam),
    ]) == 0
    st = open(str(bam) + ".scRNA.SampleTable").read().splitlines()
    _, _, total, mapped, assigned, _ = st[1].split("\t")
    assert int(assigned) >= 0.85 * n
    bcs = open(str(bam) + ".scRNA.001.HighConf.BCtab").read().split()
    assert set(bcs) <= set(barcodes) and len(bcs) >= 1


def test_bcl_read_reader(tmp_path):
    """--BCLinput read source: genomic segment + '|'-joined name fields
    from a synthetic run directory."""
    from subread_tpu.io.bcl import ReadSegment, write_synthetic_run
    from subread_tpu.io.scrna import BCLReadReader

    segments = [
        ReadSegment(cycles=26, is_index=False),  # BC(16)+UMI(10)
        ReadSegment(cycles=8, is_index=True),    # sample index
        ReadSegment(cycles=30, is_index=False),  # cDNA
    ]
    reads = [
        ("ACGTACGTACGTACGT" + "T" * 10, "ACGTACGT", "A" * 30),
        ("TTTTACGTACGTACGT" + "G" * 10, "ACGTACGT", "C" * 30),
    ]
    write_synthetic_run(str(tmp_path / "run"), {1: reads}, segments)
    rd = BCLReadReader(str(tmp_path / "run"))
    batch = rd.next_batch(10)
    assert len(batch.names) == 2
    f = batch.names[0].split("|")
    assert f[0] == "R00000000001"
    assert f[1] == "ACGTACGTACGTACGT" + "T" * 10
    assert f[3] == "ACGTACGT"
    assert f[5] == "L001"
    # genomic read decodes to the cDNA segment
    seq = "".join("AGCT"[c] for c in batch.codes[0][: batch.lengths[0]])
    assert seq == "A" * 30
