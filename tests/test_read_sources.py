"""Read-source parity tests: FASTA/SAM/BAM read input, --trim5/--trim3,
-b color-space decode, and format auto-detection (reference geinput_open,
input-files.c:455).  Host-only."""

import numpy as np

from subread_tpu import dna
from subread_tpu.io.fastq import (
    FastaReadReader,
    SamReadReader,
    make_trim_transform,
    open_read_source,
)


def test_colorspace_decode_roundtrip():
    # encode ACGTACGT in color space then decode
    seq = b"ACGTTGCA"
    # chars2color table (input-files.c:1337)
    table = {
        ("A", "A"): 0, ("A", "C"): 1, ("A", "G"): 2, ("A", "T"): 3,
        ("C", "A"): 1, ("C", "C"): 0, ("C", "G"): 3, ("C", "T"): 2,
        ("G", "A"): 2, ("G", "C"): 3, ("G", "G"): 0, ("G", "T"): 1,
        ("T", "A"): 3, ("T", "C"): 2, ("T", "G"): 1, ("T", "T"): 0,
    }
    cs = b"A" + bytes(
        0x30 + table[(chr(seq[i - 1]), chr(seq[i]))] if i else 0
        for i in range(1, len(seq))
    )
    # decode starts from the primer base 'A' == seq[0]
    out = dna.colorspace_decode(cs)
    assert out[1:] == seq[1:]


def test_trim_transform():
    tf = make_trim_transform(trim5=2, trim3=3)
    seq, qual = tf(b"AACGTACGTT", b"0123456789")
    assert seq == b"CGTAC"
    assert qual == b"23456"
    assert make_trim_transform() is None


def test_fasta_reader(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">r1 desc\nACGT\nACGT\n>r2\nTTTT\n")
    rd = FastaReadReader(str(p))
    b = rd.next_batch(10)
    assert b.names == ["r1", "r2"]
    assert b.lengths.tolist() == [8, 4]
    assert dna.decode(b.codes[0, :8]) == "ACGTACGT"
    assert rd.next_batch(10) is None
    rd.close()


def test_sam_read_reader_revcomps_reverse_records(tmp_path):
    p = tmp_path / "in.sam"
    p.write_text(
        "@SQ\tSN:c\tLN:100\n"
        "r1\t0\tc\t1\t30\t4M\t*\t0\t0\tACGT\tIIII\n"
        "r2\t16\tc\t1\t30\t4M\t*\t0\t0\tACGT\tABCD\n"   # revcomp -> ACGT
        "r3\t256\tc\t1\t30\t4M\t*\t0\t0\tAAAA\tIIII\n"  # secondary: skipped
    )
    rd = SamReadReader(str(p))
    b = rd.next_batch(10)
    assert b.names == ["r1", "r2"]
    assert dna.decode(b.codes[1, :4]) == "ACGT"
    assert b.quals[1, :4].tobytes() == b"DCBA"


def test_open_read_source_detection(tmp_path):
    fq = tmp_path / "a.fq"
    fq.write_text("@r1\nACGT\n+\nIIII\n")
    fa = tmp_path / "a.fa"
    fa.write_text(">r1\nACGT\n")
    sam = tmp_path / "a.sam"
    sam.write_text("@HD\tVN:1.0\nr1\t0\tc\t1\t30\t4M\t*\t0\t0\tACGT\tIIII\n")
    import gzip

    fqgz = tmp_path / "a.fq.gz"
    with gzip.open(fqgz, "wb") as f:
        f.write(b"@r1\nACGT\n+\nIIII\n")

    for path, cls in [
        (fq, "FastqReader"), (fa, "FastaReadReader"),
        (sam, "SamReadReader"), (fqgz, "FastqReader"),
    ]:
        rd = open_read_source(str(path))
        assert type(rd).__name__ == cls, path
        b = rd.next_batch(10)
        assert b.names == ["r1"]
        rd.close()


def test_sam_reader_mate_split(tmp_path):
    p = tmp_path / "pe.sam"
    p.write_text(
        "r1\t77\t*\t0\t0\t*\t*\t0\t0\tAAAA\tIIII\n"    # paired, first
        "r1\t141\t*\t0\t0\t*\t*\t0\t0\tCCCC\tIIII\n"   # paired, second
    )
    r1 = SamReadReader(str(p), mate=0).next_batch(10)
    r2 = SamReadReader(str(p), mate=1).next_batch(10)
    assert dna.decode(r1.codes[0, :4]) == "AAAA"
    assert dna.decode(r2.codes[0, :4]) == "CCCC"


def test_known_junctions_from_annotation(tmp_path):
    from subread_tpu.align.pipeline import known_junctions_from_annotation
    from subread_tpu.io.gtf import load_annotation

    gtf = tmp_path / "a.gtf"
    gtf.write_text(
        'c1\tx\texon\t100\t200\t.\t+\t.\tgene_id "g1";\n'
        'c1\tx\texon\t301\t400\t.\t+\t.\tgene_id "g1";\n'
        'c1\tx\texon\t150\t220\t.\t+\t.\tgene_id "g1";\n'   # extends 1st
        'c2\tx\texon\t10\t20\t.\t-\t.\tgene_id "g2";\n'
        'c2\tx\texon\t50\t60\t.\t-\t.\tgene_id "g2";\n'
    )
    ann = load_annotation(str(gtf))
    j = known_junctions_from_annotation(ann)
    # g1: junction from max-end 220 to next start 301 (0-based edges)
    assert ("c1", 219, 300, 0) in j
    # g2 on minus strand
    assert ("c2", 19, 49, 1) in j
    assert len(j) == 2
