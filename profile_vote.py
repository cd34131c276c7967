"""Micro-attribution inside vote_batch via cumulative-stage jits.

Run on the real chip; prints per-dispatch ms for each cumulative prefix of
the vote pipeline (keys -> gather -> sort -> window loop -> full) for both
the main (H=32) and the rescue (H=rescue_hits) parameter sets.
"""
import functools
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
    from subread_tpu.ops import vote as V
    from subread_tpu import dna

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    rng = np.random.default_rng(12345)
    n = 16384
    batch, _ = simulate_reads(genome, n, read_len=100, rng=rng, error_rate=0.005)
    cfg = aligner_config(batch_reads=n)
    al = Aligner(genome, index, cfg)

    pcodes, pambig, lens, R0 = al._pad_batch(batch)
    words, _ = dna.pack_reads_host(pcodes, pambig)
    d_words = jnp.asarray(words)
    d_lens = jnp.asarray(lens)
    L = pcodes.shape[1]
    ul = uniform_length(lens[:R0])
    codes, ambig = al._unpack_na(d_words, L)
    bs_, cb, sb_, sl_ = al.d_blocks[0]
    bb0, e0, st0 = al.block_meta[0]

    def force(r):
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    def timeit(name, fn, reps=10):
        force(fn())
        t0 = time.time(); force(fn()); t1 = time.time() - t0
        t0 = time.time()
        rs = [fn() for _ in range(reps)]
        force(rs[-1])
        print(f"{name:34s} {(time.time()-t0-t1)/(reps-1)*1000:8.2f} ms/dispatch")

    def stages(tag, params, rows):
        c = codes[:rows]
        a = ambig[:rows]
        l = d_lens[:rows]
        offs_f = V.static_offsets(ul, params)
        H = params.max_hits
        S = params.total_subreads
        gap = max(params.index_gap, 1)
        P0 = S * gap
        extract_np = np.concatenate([offs_f, (ul - V.KMER - offs_f)])
        is_rev_p = np.arange(2 * P0) >= P0
        P = 2 * P0

        @jax.jit
        def s_keys(c, a, l):
            keys_raw, wamb_p = V.probe_keys_static(c, a, extract_np)
            rck = V.revcomp_keys(keys_raw)
            keys = jnp.minimum(keys_raw, rck)
            flip_req = jnp.where(
                jnp.asarray(is_rev_p)[None, :], keys != rck, keys != keys_raw
            )
            valid = ~wamb_p & (l[:, None] >= np.int32(ul))
            return keys, flip_req, valid

        @jax.jit
        def s_gather(c, a, l):
            keys, flip_req, valid = s_keys(c, a, l)
            return V.gather_hits(keys, valid, bs_, cb, bb0, params,
                                 sb_, sl_, e0, st0, probe_orient=flip_req)

        def common(c, a, l):
            keys, flip_req, valid = s_keys(c, a, l)
            hit_pos, hit_valid, trunc = V.gather_hits(
                keys, valid, bs_, cb, bb0, params, sb_, sl_, e0, st0,
                probe_orient=flip_req)
            ownoff = np.concatenate([offs_f, offs_f])
            off_r = np.repeat(ownoff, H)[None, :]
            sn = (np.repeat(np.arange(S), gap) if gap > 1
                  else np.arange(S)).astype(np.uint32)
            subid_r = np.repeat(np.tile(sn, 2), H)[None, :]
            strand3 = jnp.broadcast_to(
                jnp.asarray(np.repeat(is_rev_p.astype(np.uint32), H)[None, :]),
                hit_valid.shape)
            off3 = jnp.broadcast_to(jnp.asarray(off_r), hit_valid.shape
                                    ).astype(jnp.int32)
            kv3 = jnp.where(
                hit_valid, hit_pos - off3.astype(jnp.uint32), V.SENTINEL
            )
            pk3 = np.repeat(np.tile(np.arange(P0, dtype=np.uint32), 2), H)[None, :]
            payload = (off3.astype(jnp.uint32) | (strand3 << np.uint32(12))
                       | (subid_r << np.uint32(13))
                       | (jnp.asarray(pk3) << np.uint32(19)))
            return kv3, payload

        @jax.jit
        def s_sort(c, a, l):
            kv3, payload = common(c, a, l)
            return jax.lax.sort((kv3, payload), dimension=-1, num_keys=1)

        @jax.jit
        def s_window(c, a, l):
            kv3, payload = common(c, a, l)
            return V._vote_merged(kv3, payload, params)

        full = functools.partial(
            V.vote_batch, bucket_bits=bb0, params=params, static_len=ul,
            sub_base=sb_, sub_lo=sl_, sub_bits=e0, search_steps=st0)

        timeit(f"{tag} keys", lambda: s_keys(c, a, l))
        timeit(f"{tag} +gather", lambda: s_gather(c, a, l))
        timeit(f"{tag} +sort", lambda: s_sort(c, a, l))
        timeit(f"{tag} +window", lambda: s_window(c, a, l))
        timeit(f"{tag} full vote", lambda: full(c, a, l, bs_, cb))

    stages("main[16K,H=32,W=32]", al.vote_params, n)
    stages(f"resc[{al.rescue_fold_cap},H={al.rescue_hits},W=64]",
           al.rescue_vote_params, al.rescue_fold_cap)


if __name__ == "__main__":
    main()
