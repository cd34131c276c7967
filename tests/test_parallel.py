"""Multi-device sharding tests on the 8-device CPU mesh.

The reference's only parallelism is pthreads (SURVEY.md §1); our analog is
reads-data-parallel sharding over a device mesh with a replicated index.
These tests verify the sharded step produces identical results to the
single-device path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices (xla_force_host_platform_device_count)")
    return devs[:8]


def test_sharded_align_matches_single_device(
    chr901_genome, chr901_index, rng, cpu_devices
):
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.parallel.mesh import make_mesh, sharded_align_step
    from subread_tpu.utils.simulate import simulate_reads

    cfg = aligner_config(batch_reads=256, pad_read_len=128)
    # a CPU-pinned aligner so both paths run on the same platform
    cpu0 = cpu_devices[0]
    with jax.default_device(cpu0):
        al = Aligner(chr901_genome, chr901_index, cfg)
        batch, _ = simulate_reads(chr901_genome, 256, read_len=100, rng=rng,
                                  error_rate=0.01)
        codes, ambig, lens, R = al._pad_batch(batch)
        single = jax.device_get(
            al._device_align(
                jax.numpy.asarray(codes), jax.numpy.asarray(ambig),
                jax.numpy.asarray(lens), al.d_bucket_start, al.d_comb,
                al.d_sub_base, al.d_sub_lo, al.d_genome,
            )
        )

    mesh = make_mesh(8, devices=cpu_devices)
    step = sharded_align_step(mesh, al)
    sharded = jax.device_get(step(codes, ambig, lens))

    for key in ("pos", "strand", "mism", "mapped", "mapq"):
        assert np.array_equal(single[key], sharded[key]), key


def test_mesh_summary_reduction(cpu_devices):
    """Per-shard summary counters merge with a psum — the analog of the
    reference's per-thread count tables merged at barriers
    (fc_thread_merge_results, readSummary.c:5795)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    mesh = Mesh(np.array(cpu_devices), ("reads",))
    x = np.arange(64, dtype=np.int32)
    xs = jax.device_put(x, NamedSharding(mesh, P("reads")))

    @jax.jit
    def total_mapped(v):
        return (v % 2 == 0).sum()

    assert int(total_mapped(xs)) == 32


def test_distributed_helpers_single_process():
    """distributed.py helpers in the single-process regime (the multi-host
    paths need jax.distributed; logic shared with the single path)."""
    import numpy as np

    from subread_tpu.parallel.distributed import (
        allgather_event_table,
        host_shard_range,
        init_distributed,
        psum_stats,
    )

    assert init_distributed() is False  # no coordinator configured
    r = host_shard_range(100, 0, 3)
    assert (r.start, r.stop) == (0, 34)
    assert host_shard_range(100, 2, 3).stop == 100
    s = psum_stats({"mapped": 5, "total": 10})
    assert s == {"mapped": 5, "total": 10}
    l, r_, sup = allgather_event_table(
        np.array([10, 10, 20], np.uint32),
        np.array([50, 50, 70], np.uint32),
        np.array([2, 3, 1], np.int64),
    )
    assert l.tolist() == [10, 20] and r_.tolist() == [50, 70]
    assert sup.tolist() == [5, 1]


def test_index_sharded_vote_matches_block_fold(
    chr901_genome, chr901_index, rng, cpu_devices
):
    """Index sharded over the mesh's "index" axis (each chip holds 1/S of
    the position-split index; partial votes allgathered + folded) must be
    bit-identical to the single-device sequential block fold — the spatial
    form of the reference's index-block serialization (core.c:3562-3613)."""
    import jax.numpy as jnp

    from subread_tpu.ops.vote import VoteParams, merge_vote_results, vote_batch
    from subread_tpu.parallel.index_shard import (
        index_sharded_vote,
        make_mesh_2d,
        place_sharded_index,
        split_index_shards,
        stack_shards,
    )
    from subread_tpu.utils.simulate import simulate_reads

    params = VoteParams()
    shards = split_index_shards(chr901_index, 4)
    assert len(shards) == 4
    assert sum(s.n_items for s in shards) >= chr901_index.n_items
    bs, cb, sb, sl, bits, sbits = stack_shards(shards)

    batch, _ = simulate_reads(
        chr901_genome, 256, read_len=100, rng=rng, error_rate=0.01
    )
    codes = jnp.asarray(batch.codes)
    ambig = jnp.asarray(batch.ambig)
    lens = jnp.asarray(batch.lengths)

    with jax.default_device(cpu_devices[0]):
        acc = vote_batch(
            codes, ambig, lens, jnp.asarray(bs[0]),
            jnp.asarray(cb[0]), bits, params,
            sub_base=jnp.asarray(sb[0]), sub_lo=jnp.asarray(sl[0]),
            sub_bits=sbits,
        )
        for i in range(1, len(shards)):
            acc = merge_vote_results(
                acc,
                vote_batch(
                    codes, ambig, lens, jnp.asarray(bs[i]),
                    jnp.asarray(cb[i]), bits, params,
                    sub_base=jnp.asarray(sb[i]), sub_lo=jnp.asarray(sl[i]),
                    sub_bits=sbits,
                ),
                params,
            )
        single = jax.device_get(acc)

    mesh = make_mesh_2d(2, 4, cpu_devices)
    d_bs, d_cb, d_sb, d_sl = place_sharded_index(mesh, bs, cb, sb, sl)
    step = index_sharded_vote(mesh, bits, params, sub_bits=sbits)
    sharded = jax.device_get(step(codes, ambig, lens, d_bs, d_cb, d_sb, d_sl))

    for f in single._fields:
        assert np.array_equal(getattr(single, f), getattr(sharded, f)), f

    # and the shard split must not lose accuracy vs the full index
    fsb, fsl, fsbits, fsteps = chr901_index.sub_dir
    full = jax.device_get(
        vote_batch(
            codes, ambig, lens, jnp.asarray(chr901_index.bucket_start),
            jnp.asarray(chr901_index.comb_rows), chr901_index.bucket_bits,
            params,
            sub_base=jnp.asarray(fsb), sub_lo=jnp.asarray(fsl),
            sub_bits=fsbits, search_steps=fsteps,
        )
    )
    agree = np.mean(
        (sharded.pos[:, 0] == full.pos[:, 0])
        & (sharded.strand[:, 0] == full.strand[:, 0])
    )
    assert agree >= 0.97, agree
