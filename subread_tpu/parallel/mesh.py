"""Mesh construction and sharded alignment steps.

Round-1 scope: 1-D "reads" data parallelism with a replicated index —
the direct analog of the reference's thread pool pulling read blocks from
a shared input (core.c:3379-3461), where every thread (chip) sees the
whole index.  The index-sharded variant (all-to-all key routing,
SURVEY.md §2 parallelism table) follows once the replicated path is at
speed.

Summary statistics (mapped/unique counts — the reference's per-thread
counters merged at barriers) ride the same jit as psums when run under
shard_map; for the plain NamedSharding path XLA inserts the collectives.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

READS_AXIS = "reads"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (READS_AXIS,))


def shard_batch(mesh: Mesh, *arrays):
    """Place read-batch arrays with the leading axis sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(READS_AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh: Mesh, *arrays):
    out = [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]
    return tuple(out)


def sharded_align_step(mesh: Mesh, aligner):
    """Build a jitted, mesh-sharded full align step for an Aligner.

    Returns step(codes, ambig, lens) where inputs are host numpy arrays
    whose leading dim divides the mesh size; outputs live sharded on the
    mesh.  The index arrays are replicated once.
    """
    d_bucket, d_comb, d_sb, d_sl, d_gen = replicate(
        mesh, aligner.d_bucket_start, aligner.d_comb, aligner.d_sub_base,
        aligner.d_sub_lo, aligner.d_genome,
    )

    def step(codes, ambig, lens):
        c, a, l = shard_batch(
            mesh, jnp.asarray(codes), jnp.asarray(ambig), jnp.asarray(lens)
        )
        # the full single-chip step — votes, scan-2, device rescue fold —
        # under SPMD sharding: XLA inserts the collectives (the rescue
        # compaction gathers saturated reads across shards), and results
        # stay bit-identical to the single-device path.  Residual overflow
        # beyond rescue_fold_cap still routes through
        # aligner._rescue_saturated on the host, same as align_batch.
        return aligner._device_align(
            c, a, l, d_bucket, d_comb, d_sb, d_sl, d_gen
        )

    return step
