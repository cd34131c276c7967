"""Measure client-side blocking cost of issuing each dispatch (no fetch)."""
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
    from subread_tpu import dna

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    rng = np.random.default_rng(12345)
    n = 1 << 16
    batch, _ = simulate_reads(genome, n, read_len=100, rng=rng, error_rate=0.005)
    cfg = aligner_config(batch_reads=16384)
    al = Aligner(genome, index, cfg)
    al.align_batch(batch)  # warm everything

    # instrument: time every phase of align_batch by hand
    t_all0 = time.time()
    codes, ambig, lens, R = al._pad_batch(batch)
    t_pad = time.time()
    ul = uniform_length(lens[:R])
    bs = al.cfg.batch_reads
    no_ambig = not ambig.any()
    Lp = codes.shape[1]
    n_sub = len(lens) // bs
    words, amask = dna.pack_reads_host(codes, ambig)
    t_pack = time.time()
    d_words = jnp.asarray(words)
    d_lens = jnp.asarray(lens)
    d_amask = None if no_ambig else jnp.asarray(amask)
    t_up = time.time()
    idxs = al._iota(n_sub) if n_sub > 1 else (None,)
    pending, bufs = [], []
    t_issue = []
    for j in range(n_sub):
        t0 = time.time()
        dc, da, dl = al._prep(d_words, d_lens, d_amask, idxs[j], bs, Lp)
        t1 = time.time()
        res = al._device_align(dc, da, dl, al.d_bucket_start, al.d_comb,
                               al.d_genome, uniform_len=ul)
        t2 = time.time()
        pending.append(res)
        bufs.append(al._pack_res(res))
        t3 = time.time()
        t_issue.append((t1 - t0, t2 - t1, t3 - t2))
    t_dispatch = time.time()
    items, seg_len = al._res_layout(pending[0], bs)
    fetch_ts = []
    for j in range(n_sub):
        t0 = time.time()
        seg = np.array(jax.device_get(bufs[j]))
        fetch_ts.append(time.time() - t0)
    t_fetch = time.time()
    print(f"pad_batch        {1000*(t_pad-t_all0):7.2f} ms")
    print(f"pack_reads_host  {1000*(t_pack-t_pad):7.2f} ms")
    print(f"upload issue     {1000*(t_up-t_pack):7.2f} ms")
    for j, (a, b, c) in enumerate(t_issue):
        print(f"sub{j}: prep {1000*a:6.2f}  align {1000*b:6.2f}  pack {1000*c:6.2f} ms (issue)")
    print(f"fetches: {['%.1f' % (1000*x) for x in fetch_ts]} ms")
    print(f"TOTAL            {1000*(t_fetch-t_all0):7.2f} ms -> {n/(t_fetch-t_all0):,.0f} reads/s")


if __name__ == "__main__":
    main()
