"""Per-stage wall-clock attribution of the SE align pipeline (real chip)."""
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
    no_ambig = not pambig.any()
    words, amask = dna.pack_reads_host(pcodes, pambig)
    d_words = jnp.asarray(words)
    d_lens = jnp.asarray(lens)
    d_amask = None if no_ambig else jnp.asarray(amask)
    L = pcodes.shape[1]
    ul = uniform_length(lens[:R])

    def force(r):
        # block_until_ready is a no-op through the tunnel: fetch one element
        leaves = jax.tree_util.tree_leaves(r)
        for leaf in leaves:
            np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    def timeit(name, fn, reps=12):
        force(fn())  # warm (compile)
        # measure k chained dispatches + one force, subtract 1-dispatch time
        t0 = time.time()
        force(fn())
        t1 = time.time() - t0
        t0 = time.time()
        rs = [fn() for _ in range(reps)]
        force(rs[-1])
        tk = time.time() - t0
        per = (tk - t1) / (reps - 1)
        print(f"{name:28s} {per*1000:8.2f} ms/dispatch   (1-shot {t1*1000:.1f} ms)")
        return rs[0]

    # stage 1: unpack
    if d_amask is None:
        unp = timeit("unpack", lambda: al._unpack_na(d_words, L))
        codes, ambig = unp
    else:
        codes, ambig = timeit("unpack", lambda: al._unpack(d_words, d_amask, L))
    bs, cb, sb, sl = al.d_blocks[0]
    bb0, e0, st0 = al.block_meta[0]

    v = timeit("vote_batch", lambda: vote_batch(
        codes, ambig, d_lens, bs, cb, bb0, al.vote_params,
        static_len=ul, sub_base=sb, sub_lo=sl, sub_bits=e0,
        search_steps=st0))

    sc = timeit("score_candidates", lambda: al._score_candidates(
        codes, ambig, d_lens, al.d_genome, v, uniform_len=ul))

    res = timeit("select_se", lambda: al._select_se(d_lens, sc))

    # whole fused dispatch as align_batch does it
    t0 = time.time()
    full = al._device_align(codes, ambig, d_lens, bs, cb, sb, sl, al.d_genome, uniform_len=ul)
    jax.block_until_ready(full)
    print(f"{'_device_align (first)':28s} {(time.time()-t0)*1000:8.2f} ms")
    ts = []
    for _ in range(5):
        t0 = time.time()
        full = al._device_align(codes, ambig, d_lens, bs, cb, sb, sl, al.d_genome, uniform_len=ul)
        jax.block_until_ready(full)
        ts.append(time.time() - t0)
    print(f"{'_device_align (steady)':28s} {sorted(ts)[2]*1000:8.2f} ms")

    # fetch cost
    from subread_tpu.align.pipeline import fetch_result
    packed = al._pack_res(full)
    jax.block_until_ready(packed)
    ts = []
    for _ in range(5):
        t0 = time.time()
        seg = np.array(jax.device_get(packed))
        ts.append(time.time() - t0)
    print(f"{'fetch packed':28s} {sorted(ts)[2]*1000:8.2f} ms  ({packed.nbytes} bytes)")

    # end-to-end align_batch
    al.align_batch(batch)
    ts = []
    for _ in range(5):
        t0 = time.time()
        al.align_batch(batch)
        ts.append(time.time() - t0)
    dt = sorted(ts)[2]
    print(f"{'align_batch end-to-end':28s} {dt*1000:8.2f} ms  -> {n/dt:,.0f} reads/s")


if __name__ == "__main__":
    main()
