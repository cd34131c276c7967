import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from subread_tpu import dna
from subread_tpu.ops.vote import VoteParams, vote_batch
from subread_tpu.utils.simulate import simulate_reads


def run_vote(genome, index, batch, params):
    sb, sl, sbits, steps = index.sub_dir
    return jax.device_get(
        vote_batch(
            jnp.asarray(batch.codes),
            jnp.asarray(batch.ambig),
            jnp.asarray(batch.lengths),
            jnp.asarray(index.bucket_start),
            jnp.asarray(index.comb_rows),
            index.bucket_bits,
            params,
            sub_base=jnp.asarray(sb), sub_lo=jnp.asarray(sl),
            sub_bits=sbits, search_steps=steps,
        )
    )


def params_for(index, **kw):
    return VoteParams(**kw)


def hits_truth(res, i, lin, tol=2, min_votes=3):
    """True if any top-K candidate with near-max votes is at the truth.

    Reads landing in genomic repeats legitimately multi-map; the reference
    test harness tolerates this the same way (readname_ora_match.py counts
    a 1200bp radius and ~97% accuracy)."""
    vmax = int(res.votes[i].max())
    for k in range(res.votes.shape[1]):
        if res.votes[i, k] >= max(min_votes, vmax - 1) and abs(int(res.pos[i, k]) - lin) <= tol:
            return True
    return False


def test_vote_exact_reads(chr901_genome, chr901_index, rng):
    g, idx = chr901_genome, chr901_index
    batch, _ = simulate_reads(g, 128, read_len=100, rng=rng)
    res = run_vote(g, idx, batch, params_for(idx))
    # every error-free read should get a dominant cluster at the true position
    ok = 0
    for i, name in enumerate(batch.names):
        pos1 = int(name.split("_")[1])
        lin = g.chro_to_linear(0, pos1 - 1)
        # with the 16-wide bucket window a probe inside a >16-copy repeat
        # run can lose its vote (same truncation class as the reference's
        # GENE_VOTE_SPACE=24 cap); clustering still finds every position
        # (asserted below) but a deep-repeat read can drop to min_votes
        assert res.votes[i, 0] >= 3, name
        if hits_truth(res, i, lin):
            ok += 1
    # one read (sim32) sits in a deep repeat where only 3 of 10 probes
    # survive the H-wide bucket window; its 3-vote truth cluster can lose
    # the last top-K slot to an equal-vote repeat copy on a tie-break
    # (the reference multi-maps such reads too)
    assert ok >= len(batch) - 1, f"{ok}/{len(batch)}"


def test_vote_reverse_strand(chr901_genome, chr901_index, rng):
    g, idx = chr901_genome, chr901_index
    batch, _ = simulate_reads(g, 128, read_len=100, rng=rng)
    # reverse-complement the reads: the mapper must find them on strand 1
    rc = np.zeros_like(batch.codes)
    for i in range(len(batch)):
        L = int(batch.lengths[i])
        rc[i, :L] = dna.revcomp(batch.codes[i, :L])
    batch.codes = rc
    res = run_vote(g, idx, batch, params_for(idx))
    ok = 0
    for i, name in enumerate(batch.names):
        pos1 = int(name.split("_")[1])
        lin = g.chro_to_linear(0, pos1 - 1)
        assert res.votes[i, 0] >= 3, name
        assert res.strand[i].max() == 1
        if hits_truth(res, i, lin):
            ok += 1
    # a couple of repeat-straddling reads may legitimately resolve to the
    # other copy of a duplication (chr901 is 24% duplicated)
    assert ok >= len(batch) - 3, f"{ok}/{len(batch)}"


def test_vote_with_errors(chr901_genome, chr901_index, rng):
    g, idx = chr901_genome, chr901_index
    batch, _ = simulate_reads(g, 128, read_len=100, rng=rng, error_rate=0.02)
    res = run_vote(g, idx, batch, params_for(idx))
    ok = 0
    for i, name in enumerate(batch.names):
        pos1 = int(name.split("_")[1])
        lin = g.chro_to_linear(0, pos1 - 1)
        if hits_truth(res, i, lin):
            ok += 1
    assert ok >= 120  # ≥94% despite 2% error rate


def test_vote_deletion_read(chr901_genome, chr901_index, rng):
    g, idx = chr901_genome, chr901_index
    batch, _ = simulate_reads(
        g, 128, read_len=100, rng=rng, indel_rate=1.0, max_indel=4
    )
    res = run_vote(g, idx, batch, params_for(idx))
    ok = 0
    for i, name in enumerate(batch.names):
        pos1 = int(name.split("_")[1])
        lin = g.chro_to_linear(0, pos1 - 1)
        if hits_truth(res, i, lin, tol=5):
            ok += 1
    assert ok >= 116


def test_vote_unmappable_read(chr901_genome, chr901_index):
    g, idx = chr901_genome, chr901_index
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=(128, 100)).astype(np.uint8)
    from subread_tpu.io.fastq import ReadBatch

    batch = ReadBatch(
        names=["r%d" % i for i in range(128)],
        codes=codes,
        lengths=np.full(128, 100, dtype=np.int32),
        quals=np.full((128, 100), ord("h"), dtype=np.uint8),
        ambig=np.zeros((128, 100), dtype=bool),
    )
    res = run_vote(g, idx, batch, params_for(idx))
    # random 100-mers should not collect many consistent votes
    assert res.votes[:, 0].max() <= 3
