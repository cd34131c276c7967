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
                al.d_genome,
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
