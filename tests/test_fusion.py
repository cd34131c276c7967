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
