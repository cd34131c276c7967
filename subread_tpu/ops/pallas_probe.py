"""Pallas probe kernel: per-probe bucket-slab DMA instead of scalar gathers.

STATUS: correct but NOT wired into the pipeline — measured 12.7 us/probe
(dual pipelined 8KB DMAs per probe, NBUF=4) vs ~0.45 us/probe for the XLA
scalar-gather formulation in ops/vote.py.  Per-probe DMA is issue-latency
bound; the TPU's gather engine handles this scattered access pattern far
better (~15 ns per gathered element).  Kept as a validated reference for a
future design that batches many probes per DMA (e.g. bucketized read
reordering so probes hitting nearby slabs share one bulk DMA).

Mechanics that DO work through Mosaic (hard-won, keep for reuse):
aligned pl.ds slices of 1-D HBM arrays need `pl.multiple_of(start, 1024)`
and a 1-D VMEM destination; scalars come in via
PrefetchScalarGridSpec(num_scalar_prefetch=...); dynamic in-register
window extraction works via `pltpu.roll` with a traced shift (unaligned
dynamic lane slices are rejected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 1024   # HBM tiling of 1-D int32 arrays
SLAB = 2 * ALIGN
BLOCK = 512    # probes per grid program
NBUF = 4       # DMA pipeline depth
SENT_KEY = np.int32(0x7FFF_0000)


def _probe_kernel(abase_ref, lo_ref, hi_ref, q_ref, off_ref, keys_ref,
                  pos_ref, out_ref, kbuf, pbuf, ksem, psem):
    """One grid program: BLOCK probes.

    abase/lo/hi/q/off: SMEM int32 [BLOCK] (abase = lo rounded down to 1024);
    keys/pos: HBM int32 [N_padded]; out: VMEM int32 [BLOCK, 128]
    (kv of up to the first 128 hits, -1 = invalid);
    kbuf/pbuf: VMEM int32 [NBUF, 1, SLAB].
    """

    gbase = pl.program_id(0) * BLOCK

    def dmas(slot, i):
        start = pl.multiple_of(abase_ref[gbase + i], ALIGN)
        return (
            pltpu.make_async_copy(
                keys_ref.at[pl.ds(start, SLAB)],
                kbuf.at[pl.ds(slot * SLAB, SLAB)], ksem.at[slot]),
            pltpu.make_async_copy(
                pos_ref.at[pl.ds(start, SLAB)],
                pbuf.at[pl.ds(slot * SLAB, SLAB)], psem.at[slot]),
        )

    for k in range(NBUF - 1):
        a, b = dmas(k, k)
        a.start()
        b.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)

    def body(i, _):
        slot = i % NBUF

        @pl.when(i + NBUF - 1 < BLOCK)
        def _():
            a, b = dmas((i + NBUF - 1) % NBUF, i + NBUF - 1)
            a.start()
            b.start()

        a, b = dmas(slot, i)
        a.wait()
        b.wait()
        q = q_ref[gbase + i]
        keys = kbuf[pl.ds(slot * SLAB, SLAB)].reshape(1, SLAB)
        poss = pbuf[pl.ds(slot * SLAB, SLAB)].reshape(1, SLAB)
        lane_abs = lane + abase_ref[gbase + i]
        ok = (keys == q) & (lane_abs >= lo_ref[gbase + i]) & (lane_abs < hi_ref[gbase + i])
        kv = jnp.where(ok, poss - off_ref[gbase + i], jnp.int32(-1))
        # hits form one contiguous run; rotate it to lane 0
        first = jnp.min(jnp.where(ok, lane, jnp.int32(SLAB)))
        rolled = pltpu.roll(kv, -first, 1)
        out_ref[pl.ds(i, 1), :] = rolled[:, :128]
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit, static_argnames=("max_hits",))
def probe_hits_pallas(
    lo: jnp.ndarray,        # int32 [P_total] bucket starts (entry index)
    hi: jnp.ndarray,        # int32 [P_total] bucket ends
    q: jnp.ndarray,         # int32 [P_total] in-bucket short keys
    off: jnp.ndarray,       # int32 [P_total] probe read-offsets
    keys_pad: jnp.ndarray,  # int32 [Npad] (1024-multiple + SLAB sentinels)
    pos_pad: jnp.ndarray,   # int32 [Npad]
    max_hits: int,
):
    """Returns (kv int32 [P_total, max_hits], valid [P_total, max_hits])."""
    P = lo.shape[0]
    assert P % BLOCK == 0
    grid = (P // BLOCK,)
    abase = (lo >> 10) << 10

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK, 128), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF * SLAB,), jnp.int32),
            pltpu.VMEM((NBUF * SLAB,), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(abase, lo, hi, q, off, keys_pad, pos_pad)

    kv = out[:, :max_hits]
    valid = kv >= 0
    return kv, valid


def pad_index_for_pallas(keys: np.ndarray, positions: np.ndarray):
    """Pad index arrays to a 1024 multiple plus one extra slab of sentinels
    so aligned slab DMAs never run off the end."""
    n = len(keys)
    npad = ((n + ALIGN - 1) // ALIGN) * ALIGN + SLAB
    keys_pad = np.full(npad, SENT_KEY, dtype=np.int32)
    keys_pad[:n] = (
        keys.view(np.int32) if keys.dtype == np.uint32 else keys.astype(np.int32)
    )
    pos_pad = np.zeros(npad, dtype=np.int32)
    pos_pad[:n] = positions.view(np.int32)
    return keys_pad, pos_pad
