"""Tunnel-perf experiment: combined-row GROUP width for gather_hits.

Row gathers are issue-rate bound on this TPU, so fewer/wider rows should
win: GROUP=16 needs ceil(H/16)+1 = 3 row gathers per probe window (width
20), GROUP=32 needs 2 (width 40).  Measures the full gather+phase-align
stage at production shapes (R=16384, P=10, H=32), alternating the two
variants within one process so shared-chip drift hits both equally.
"""

import json
import time

import numpy as np


def main():
    from subread_tpu.utils.jaxenv import ensure_compile_cache

    ensure_compile_cache()
    import jax
    import jax.numpy as jnp

    R, P, H = 16384, 10, 32
    N = 1 << 24            # 16M index entries (~chr901 scale)
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 1 << 28, N, dtype=np.uint32)
    chk = rng.integers(0, 256, N, dtype=np.uint8)

    def build(group):
        G = (N + group - 1) // group + 3
        pos_p = np.zeros(G * group, np.uint32)
        pos_p[:N] = pos
        chk_p = np.zeros(G * group, np.uint8)
        chk_p[:N] = chk
        w = group + group // 4
        comb = np.empty((G, w), np.uint32)
        comb[:, :group] = pos_p.reshape(G, group)
        comb[:, group:] = chk_p.view(np.uint32).reshape(G, group // 4)
        return jnp.asarray(comb)

    lo_h = rng.integers(0, N - 256, (R, P)).astype(np.int32)

    def make_fn(group):
        NR = (H + group - 1) // group + 1
        NW = NR * group
        gbits = int(np.log2(group))

        @jax.jit
        def fn(comb, lo, salt):
            lo = lo + salt    # chain successive calls so they serialize
            G = comb.shape[0]
            r0 = lo >> np.int32(gbits)
            ridx = jnp.minimum(
                r0[:, :, None] + np.arange(NR, dtype=np.int32), G - 1
            )
            rows = comb[ridx]                       # [R, P, NR, W]
            pos_w = rows[:, :, :, :group].reshape(R, P * NW)
            chk_words = rows[:, :, :, group:].reshape(R, P, NR * (group // 4))
            byte_sh = (np.uint32(8) * np.arange(4, dtype=np.uint32))[
                None, None, None, :
            ]
            chk_b = (
                (chk_words[:, :, :, None] >> byte_sh) & np.uint32(0xFF)
            ).reshape(R, P * NW)
            ph = jnp.repeat(lo & (group - 1), NW, axis=1)
            b = group // 2
            while b >= 1:
                on = (ph & b) != 0
                bb = b
                sh = lambda a: jnp.pad(a[:, bb:], ((0, 0), (0, bb)))
                pos_w = jnp.where(on, sh(pos_w), pos_w)
                chk_b = jnp.where(on, sh(chk_b), chk_b)
                b //= 2
            hit_pos = pos_w.reshape(R, P, NW)[:, :, :H].reshape(R, P * H)
            checks = chk_b.reshape(R, P, NW)[:, :, :H].reshape(R, P * H)
            # tiny scalar digest: next call's salt (forces serialization);
            # axon block_until_ready returns at enqueue, so only a host
            # fetch of this digest actually waits for the work
            return (jnp.min(hit_pos ^ checks) & np.uint32(1)).astype(jnp.int32)

        return fn

    variants = {}
    for group in (16, 32, 64):
        comb = build(group)
        fn = make_fn(group)
        lo = jnp.asarray(lo_h)
        np.asarray(fn(comb, lo, jnp.int32(0)))   # compile
        variants[group] = (fn, comb, lo)

    reps = 20
    results = {g: [] for g in variants}
    for _ in range(4):                      # alternate rounds
        for g, (fn, comb, lo) in variants.items():
            salt = jnp.int32(0)
            np.asarray(fn(comb, lo, salt))        # warm
            t0 = time.time()
            for _ in range(reps):
                salt = fn(comb, lo, salt)
            np.asarray(salt)                      # one fetch drains the chain
            results[g].append((time.time() - t0) / reps * 1e3)
    for g, ts in results.items():
        print(json.dumps({"group": g, "ms_best": round(min(ts), 3),
                          "ms_all": [round(t, 3) for t in ts]}))


if __name__ == "__main__":
    main()
