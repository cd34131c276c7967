"""BCL/CBCL raw-input round-trip tests (the reference ships no BCL test
data; correctness is validated against the format spec via synthetic runs
— input-blc.c behaviours cited in io/bcl.py)."""

import numpy as np
import pytest

from subread_tpu.io.bcl import (
    LANE_ALL,
    BclReader,
    ReadSegment,
    decode_bcl_values,
    parse_cell_barcodes,
    parse_run_info,
    parse_sample_sheet,
    write_synthetic_run,
)

SEGMENTS = [
    ReadSegment(6, False),   # R1: barcode+UMI
    ReadSegment(4, True),    # I1: sample index
    ReadSegment(8, False),   # R2: cDNA
]


def _reads(rng, n, with_n=False):
    out = []
    for i in range(n):
        segs = []
        for seg in SEGMENTS:
            s = "".join(rng.choice(list("ACGT"), size=seg.cycles))
            if with_n and i % 5 == 0:
                s = "N" + s[1:]
            segs.append(s)
        out.append(tuple(segs))
    return out


@pytest.mark.parametrize("mode", ["bcl", "cbcl"])
def test_bcl_roundtrip(tmp_path, mode, rng):
    reads = {1: _reads(rng, 37, with_n=True), 2: _reads(rng, 23)}
    pf = {1: np.ones(37, bool), 2: np.ones(23, bool)}
    pf[1][5] = False  # one failing cluster dropped
    run = str(tmp_path / "run")
    write_synthetic_run(run, reads, SEGMENTS, mode=mode, pass_filter=pf,
                        tiles_per_lane=2 if mode == "cbcl" else 1)
    rd = BclReader(run)
    assert rd.layout.mode == mode
    assert [s.cycles for s in rd.segments] == [6, 4, 8]
    lane1 = rd.read_lane(1)
    assert lane1.n_clusters == 37 and lane1.n_pf == 36
    want = [r for i, r in enumerate(reads[1]) if pf[1][i]]
    for si in range(3):
        seq, qual = lane1.segments[si]
        got = ["".join(map(chr, row)) for row in seq]
        assert got == [w[si] for w in want], (mode, si)
        # no-call clusters carry '#', others the written q30 ('?')
        isn = seq == ord("N")
        assert np.all(qual[isn] == ord("#"))
        assert np.all(qual[~isn] == 33 + 30)
    lane2 = rd.read_lane(2)
    assert lane2.n_pf == 23


def test_decode_values():
    vals = np.array([0, 0 | (30 << 2), 1 | (2 << 2), 3 | (41 << 2)], np.uint8)
    seq, qual = decode_bcl_values(vals)
    assert bytes(seq) == b"NACT"
    assert bytes(qual) == bytes([ord("#"), 63, 35, 33 + 41])


def test_sample_sheet_rawdir(tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text(
        "[Header]\nFoo,Bar\n[Data]\n"
        "Lane,Sample_ID,Sample_Name,index\n"
        "1,S1,sampleA,ACGTACGT\n"
        "*,S2,sampleB,TTTTCCCC\n"
    )
    fmt, entries = parse_sample_sheet(str(p))
    assert fmt == "rawdir"
    assert entries[0].sample == "sampleA" and entries[0].lane == 1
    assert entries[0].index == "ACGTACGT"
    assert entries[1].lane == LANE_ALL and entries[1].line_no == 2


def test_sample_sheet_fastq(tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text(
        "[Data]\nBarcodeUMIFile,cDNAFile,SampleName\n"
        "r1.fq,r2.fq,cellA\n"
    )
    fmt, entries = parse_sample_sheet(str(p))
    assert fmt == "fastq"
    assert entries[0].files == ("r1.fq", "r2.fq")
    assert entries[0].sample == "cellA"


def test_cell_barcodes(tmp_path):
    p = tmp_path / "bc.txt"
    p.write_text("AACCGGTT-1\nTTGGCCAA\n")
    assert parse_cell_barcodes(str(p)) == ["AACCGGTT", "TTGGCCAA"]


def test_run_info_tiles(tmp_path):
    p = tmp_path / "RunInfo.xml"
    p.write_text(
        '<RunInfo><Run><Reads><Read Number="1" NumCycles="28" IsIndexedRead="N"/>'
        '<Read Number="2" NumCycles="8" IsIndexedRead="Y"/></Reads>'
        "<Tiles><Tile>1_1101</Tile><Tile>2_1102</Tile></Tiles></Run></RunInfo>"
    )
    ri = parse_run_info(str(p))
    assert [(s.cycles, s.is_index) for s in ri.segments] == [(28, False), (8, True)]
    assert ri.tiles == [1001101, 2001102]
