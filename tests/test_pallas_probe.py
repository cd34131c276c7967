"""Pallas probe kernel correctness (not wired into the pipeline — see the
module docstring for the perf verdict)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from subread_tpu import dna


@pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu",),
    reason="pallas TPU kernel needs a TPU device",
)
def test_pallas_probe_matches_oracle(chr901_genome, chr901_index):
    from subread_tpu.ops.pallas_probe import (
        pad_index_for_pallas, probe_hits_pallas,
    )

    g, idx = chr901_genome, chr901_index
    keys_pad, pos_pad = pad_index_for_pallas(idx.keys, idx.positions)
    bs = idx.bucket_start
    rng = np.random.default_rng(0)
    P = 2048
    pos = rng.integers(1210, 1210 + 999000 - 16, size=P)
    from subread_tpu.index.build import revcomp_keys_np

    raw = np.array(
        [dna.kmer_keys(g.codes[p : p + 16])[0] for p in pos], dtype=np.uint32
    )
    keys = np.minimum(raw, revcomp_keys_np(raw))
    bucket = (keys >> np.uint32(32 - idx.bucket_bits)).astype(np.int64)
    q = keys.view(np.int32)
    lo = bs[bucket].astype(np.int32)
    hi = bs[bucket + 1].astype(np.int32)
    off = rng.integers(0, 84, size=P).astype(np.int32)
    kv, valid = probe_hits_pallas(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(q), jnp.asarray(off),
        jnp.asarray(keys_pad), jnp.asarray(pos_pad), 24,
    )
    kvn, vn = np.asarray(kv), np.asarray(valid)
    for i in rng.integers(0, P, size=100):
        seg = idx.keys[int(lo[i]) : int(hi[i])]
        hits = (
            idx.positions[int(lo[i]) : int(hi[i])][seg == q[i]].astype(np.int64)
            - int(off[i])
        )
        got = kvn[i][vn[i]][: len(hits)]
        assert np.array_equal(np.sort(got), np.sort(hits[:24])), i
