"""Micro-attribution inside vote_batch via cumulative-stage jits."""
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
    from subread_tpu import dna
    from subread_tpu.ops import vote as V

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    rng = np.random.default_rng(12345)
    n = 16384
    batch, _ = simulate_reads(genome, n, read_len=100, rng=rng, error_rate=0.005)
    cfg = aligner_config(batch_reads=n)
    al = Aligner(genome, index, cfg)
    pcodes, pambig, lens, R0 = al._pad_batch(batch)
    words, amask = dna.pack_reads_host(pcodes, pambig)
    d_words = jnp.asarray(words)
    d_lens = jnp.asarray(lens)
    L = pcodes.shape[1]
    ul = uniform_length(lens[:R0])
    codes, ambig = al._unpack_na(d_words, L)
    bs_, cb, sb_, sl_ = al.d_blocks[0]
    bb0, e0, st0 = al.block_meta[0]
    params = al.vote_params
    bb = al.index.bucket_bits

    offs_np = V.static_offsets(ul, params)
    sub_id = np.arange(params.total_subreads, dtype=np.int32)

    @jax.jit
    def stage_keys(codes, ambig, lens):
        keys_raw, wamb_p = V.probe_keys_static(codes, ambig, offs_np)
        keys = jnp.minimum(keys_raw, V.revcomp_keys(keys_raw))
        flip_p = keys != keys_raw
        valid = ~wamb_p & (lens[:, None] >= np.int32(ul))
        return keys, flip_p, valid

    @jax.jit
    def stage_gather(codes, ambig, lens, bs, cb):
        keys, flip_p, valid = stage_keys(codes, ambig, lens)
        return V.gather_hits(keys, valid, bs, cb, bb, params,
                             sb_, sl_, e0, st0)

    @jax.jit
    def stage_sortwin(codes, ambig, lens, bs, cb):
        keys, flip_p, valid = stage_keys(codes, ambig, lens)
        hit_pos, hit_valid, hit_orient, _tr = V.gather_hits(
            keys, valid, bs, cb, bb, params, sb_, sl_, e0, st0)
        R, P = keys.shape
        H = params.max_hits
        off_r = np.repeat(offs_np, H)[None, :]
        mir_r = np.repeat(ul - V.KMER - offs_np, H)[None, :]
        flip_r = jnp.repeat(flip_p, H, axis=1)
        subid_r = np.repeat(sub_id.astype(np.uint32), H)[None, :]
        fwd_match = hit_orient == flip_r
        strand3 = (~fwd_match).astype(jnp.uint32)
        off3 = jnp.clip(jnp.where(fwd_match, off_r, mir_r), 0, L)
        kv3 = jnp.where(hit_valid, hit_pos - off3.astype(jnp.uint32), V.SENTINEL)
        payload = (off3.astype(jnp.uint32) | (strand3 << np.uint32(12))
                   | (subid_r << np.uint32(13)))
        return V._vote_merged(kv3, payload, params)

    full = functools.partial(
        V.vote_batch, bucket_bits=bb, params=params, static_len=ul,
        sub_base=sb_, sub_lo=sl_, sub_bits=e0, search_steps=st0)

    def force(r):
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    def timeit(name, fn, reps=16):
        force(fn())
        t0 = time.time(); force(fn()); t1 = time.time() - t0
        t0 = time.time()
        rs = [fn() for _ in range(reps)]
        force(rs[-1])
        tk = time.time() - t0
        print(f"{name:24s} {(tk-t1)/(reps-1)*1000:8.2f} ms/dispatch")

    timeit("keys", lambda: stage_keys(codes, ambig, d_lens))
    timeit("keys+gather", lambda: stage_gather(codes, ambig, d_lens, bs_, cb))
    timeit("keys+gather+sortwin", lambda: stage_sortwin(codes, ambig, d_lens, bs_, cb))
    timeit("full vote_batch", lambda: full(codes, ambig, d_lens, bs_, cb))


if __name__ == "__main__":
    main()
