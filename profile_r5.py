"""Round-5 hot-path attribution: vote / scan2 / rescue tiers, steady state."""
import os
import time
import numpy as np


def main():
    from subread_tpu.utils.jaxenv import ensure_compile_cache
    ensure_compile_cache()
    import jax
    import jax.numpy as jnp

    from subread_tpu.align.pipeline import Aligner, uniform_length
    from subread_tpu.config import aligner_config
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.index.genome import genome_from_fasta
    from subread_tpu.utils.simulate import simulate_reads
    from subread_tpu.ops.vote import vote_batch

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    rng = np.random.default_rng(12345)
    n = 16384
    batch, _ = simulate_reads(genome, n, read_len=100, rng=rng, error_rate=0.005)
    cfg = aligner_config(batch_reads=n)
    al = Aligner(genome, index, cfg)

    from subread_tpu import dna
    pcodes, pambig, lens, R = al._pad_batch(batch)
    words, amask = dna.pack_reads_host(pcodes, pambig)
    d_words = jnp.asarray(words)
    d_lens = jnp.asarray(lens)
    L = pcodes.shape[1]
    ul = uniform_length(lens[:R])
    dc, da = al._unpack_na(d_words, L)
    dc.block_until_ready()

    @jax.jit
    def _checksum(r):
        leaves = jax.tree_util.tree_leaves(r)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def force(r):
        np.asarray(jax.device_get(_checksum(r)))

    def timeit(name, fn, reps=10):
        force(fn())  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            force(fn())
            ts.append((time.time() - t0) * 1000)
        per = min(ts)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:34s} min {per:9.2f} ms  med {med:9.2f} ms")
        return per

    bb0, e0, st0 = al.block_meta[0]

    def vote_only():
        return vote_batch(dc, da, d_lens, al.d_bucket_start, al.d_comb,
                          bb0, al.vote_params, static_len=ul,
                          sub_base=al.d_sub_base, sub_lo=al.d_sub_lo,
                          sub_bits=e0, search_steps=st0)

    v0 = vote_only()
    force(v0)

    def scan2_only():
        return al._scan2(dc, da, d_lens, al.d_genome, v0, ul)

    res0 = scan2_only()
    force(res0)
    res0 = dict(res0)
    res0["saturated"] = v0.saturated

    def tier1_only():
        vp, cap = al.rescue_tiers[0]
        rb = min(cap, n)
        idx_r, valid_r, codes_r, ambig_r, lens_r = al._sat_compact(
            res0["saturated"], dc, da, d_lens, rb)
        return al._device_align(codes_r, ambig_r, lens_r, al.d_bucket_start,
                                al.d_comb, al.d_sub_base, al.d_sub_lo,
                                al.d_genome, uniform_len=ul, rescue=True,
                                vp=vp)

    def tier2_only():
        vp, cap = al.rescue_tiers[1]
        rb = min(cap, n)
        idx_r, valid_r, codes_r, ambig_r, lens_r = al._sat_compact(
            res0["saturated"], dc, da, d_lens, rb)
        return al._device_align(codes_r, ambig_r, lens_r, al.d_bucket_start,
                                al.d_comb, al.d_sub_base, al.d_sub_lo,
                                al.d_genome, uniform_len=ul, rescue=True,
                                vp=vp)

    def full():
        return al._device_align(dc, da, d_lens, al.d_bucket_start, al.d_comb,
                                al.d_sub_base, al.d_sub_lo, al.d_genome,
                                uniform_len=ul)

    nsat = int(np.asarray(jax.device_get(v0.saturated)).sum())
    print(f"saturated reads: {nsat}/{n}  tiers={[(c, vp.max_hits, vp.wide_slots if hasattr(vp,'wide_slots') else None) for vp,c in al.rescue_tiers]}")
    timeit("vote_batch narrow", vote_only)
    timeit("scan2 (score+select)", scan2_only)
    timeit("tier1 mixed-width (compact+align)", tier1_only)
    timeit("tier2 full-wide (compact+align)", tier2_only)
    timeit("FULL _device_align", full)


if __name__ == "__main__":
    main()
