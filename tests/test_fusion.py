"""Fusion/breakpoint detection (subjunc --allJunctions -> .breakpoints.vcf)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from subread_tpu import dna
from subread_tpu.io.fastq import ReadBatch


def _chimeric_batch(g, rng, n, posA, posB, inverted=False):
    """Reads whose first 50bp come from posA and last 50bp from posB
    (posB segment reverse-complemented when inverted)."""
    names, rows = [], []
    for i in range(n):
        a = g.codes[posA : posA + 50]
        b = g.codes[posB : posB + 50]
        if inverted:
            b = dna.revcomp(b)
        rows.append(np.concatenate([a, b]))
        names.append(f"fus{i}")
    codes = np.stack(rows).astype(np.uint8)
    return ReadBatch(
        names=names, codes=codes,
        lengths=np.full(n, 100, np.int32),
        quals=np.full((n, 100), ord("I"), np.uint8),
        ambig=np.zeros((n, 100), bool),
    )


def test_breakpoints_vcf(tmp_path, chr901_genome, chr901_index):
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import subjunc_config
    from subread_tpu.utils.simulate import write_fastq

    g = chr901_genome
    posA = g.chro_to_linear(0, 100000)
    posB = g.chro_to_linear(0, 800000)   # 700kb apart: > MAX_INTRON
    rng = np.random.default_rng(11)
    batch = _chimeric_batch(g, rng, 30, posA, posB)
    fq = tmp_path / "fus.fq"
    write_fastq(str(fq), batch)

    cfg = subjunc_config(batch_reads=256, all_junctions=True, pad_read_len=128)
    al = Aligner(g, chr901_index, cfg)
    out = tmp_path / "out.sam"
    al.align_file(str(fq), str(out))

    vcf = (tmp_path / "out.sam.breakpoints.vcf").read_text().splitlines()
    recs = [l.split("\t") for l in vcf if not l.startswith("#")]
    assert recs, "no breakpoints reported"
    assert len(recs) % 2 == 0  # paired BNDs
    # the dominant (max-SR) pair must sit at the simulated breakends:
    # end of the A block ~100049+1 and start of the B block ~800000+1
    sr_of = lambda r: int(r[7].split("SR=")[1])
    best = max(range(0, len(recs), 2), key=lambda i: sr_of(recs[i]))
    pair = recs[best : best + 2]
    pos = sorted(int(r[1]) for r in pair)
    assert abs(pos[0] - 100050) <= 12, pos
    assert abs(pos[1] - 800001) <= 12, pos
    assert sr_of(pair[0]) >= 20
    info = pair[0][7]
    assert "SVTYPE=BND" in info and "MATEID=" in info


def test_breakpoints_inversion(tmp_path, chr901_genome, chr901_index):
    """Cross-strand chimera (inversion-like): tail half reverse-complemented."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import subjunc_config
    from subread_tpu.utils.simulate import write_fastq

    g = chr901_genome
    posA = g.chro_to_linear(0, 150000)
    posB = g.chro_to_linear(0, 600000)
    rng = np.random.default_rng(12)
    batch = _chimeric_batch(g, rng, 30, posA, posB, inverted=True)
    fq = tmp_path / "inv.fq"
    write_fastq(str(fq), batch)

    cfg = subjunc_config(batch_reads=256, all_junctions=True, pad_read_len=128)
    al = Aligner(g, chr901_index, cfg)
    out = tmp_path / "out.sam"
    al.align_file(str(fq), str(out))

    vcf = (tmp_path / "out.sam.breakpoints.vcf").read_text().splitlines()
    recs = [l.split("\t") for l in vcf if not l.startswith("#")]
    assert recs
    sr_of = lambda r: int(r[7].split("SR=")[1])
    best = max(range(0, len(recs), 2), key=lambda i: sr_of(recs[i]))
    pair = recs[best : best + 2]
    pos = sorted(int(r[1]) for r in pair)
    # A-half edge ~150049+1; B-half (rc) edge = last base of the rc block
    # = posB + 49 (contig 600000+49+1)
    assert abs(pos[0] - 150050) <= 12, pos
    assert abs(pos[1] - 600050) <= 12, pos
    assert sr_of(pair[0]) >= 20


def test_breakpoints_reference_parity(tmp_path, chr901_genome, chr901_index):
    """Pinned fixture vs the reference subjunc binary (--allJunctions):
    tests/data/fusion32-chr901.ref-breakpoints.vcf is the verbatim
    .breakpoints.vcf the compiled reference v2.0.6 emits on
    fusion32-chr901.fq.gz (16 translocation + 16 inversion chimeras).
    The header and record FORMAT must match byte-for-byte and our
    dominant inversion event must agree with the reference's
    (write_fusion_final_results core-junction.c:4142-4216)."""
    import gzip
    import pathlib

    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import subjunc_config

    here = pathlib.Path(__file__).parent
    fq = tmp_path / "fus32.fq"
    fq.write_bytes(gzip.open(here / "data" / "fusion32-chr901.fq.gz").read())
    ref_vcf = (here / "data" / "fusion32-chr901.ref-breakpoints.vcf"
               ).read_text().splitlines()

    cfg = subjunc_config(batch_reads=256, all_junctions=True, pad_read_len=128)
    al = Aligner(chr901_genome, chr901_index, cfg)
    out = tmp_path / "out.sam"
    al.align_file(str(fq), str(out))
    ours = (tmp_path / "out.sam.breakpoints.vcf").read_text().splitlines()

    # header byte-parity
    assert ours[:5] == ref_vcf[:5]

    ref_recs = [l.split("\t") for l in ref_vcf if not l.startswith("#")]
    our_recs = [l.split("\t") for l in ours if not l.startswith("#")]
    assert our_recs, "no breakpoints reported"
    # reference's dominant event: inversion small side 300000, large side
    # ~320024-320052 (per-read scatter), both ends ']' (strand jumped)
    sr_of = lambda r: int(r[7].split("SR=")[1])
    ref_best = max(range(0, len(ref_recs), 2), key=lambda i: sr_of(ref_recs[i]))
    rb = ref_recs[ref_best]
    rb2 = ref_recs[ref_best + 1]
    # our table also calls the 750kb same-strand translocation the
    # reference leaves soft-clipped — a superset; the reference's dominant
    # inversion event must appear in OUR table with matching breakends
    cands = [
        our_recs[i : i + 2] for i in range(0, len(our_recs), 2)
        if our_recs[i][0] == rb[0]
        and abs(int(our_recs[i][1]) - int(rb[1])) <= 8
        and abs(int(our_recs[i + 1][1]) - int(rb2[1])) <= 30
    ]
    assert cands, (rb, our_recs)
    pair = max(cands, key=lambda p: sr_of(p[0]))
    # strand-jumped inversion: ']' brackets on both ends, REF base matches
    # the genome, INFO format identical
    for r in pair:
        assert "]" in r[4] and "[" not in r[4], r
        assert r[3] in "ACGT" and len(r[3]) == 1
        assert r[6] == "PASS" and r[7].startswith("SVTYPE=BND;MATEID=bnd_")
    assert sr_of(pair[0]) >= 2
