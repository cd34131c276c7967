"""Micro-profile of vote_batch internals: gather / sort / window / topk."""
import time
import functools
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
        force(fn())
        ts = []
        for _ in range(reps):
            t0 = time.time()
            force(fn())
            ts.append((time.time() - t0) * 1000)
        print(f"{name:30s} min {min(ts):9.2f} ms  med {sorted(ts)[len(ts)//2]:9.2f} ms")

    params = al.vote_params
    bb0, e0, st0 = al.block_meta[0]
    P0 = V.applied_subreads(ul, params)
    offs_f = V.static_offsets(ul, params)
    extract_np = np.concatenate([offs_f, (ul - V.KMER - offs_f)])

    @jax.jit
    def stage_keys():
        keys_raw, wamb_p = V.probe_keys_static(dc, da, extract_np)
        rck = V.revcomp_keys(keys_raw)
        keys = jnp.minimum(keys_raw, rck)
        nprobe = extract_np.shape[0]
        is_rev_p = np.arange(nprobe) >= P0
        flip_req = jnp.where(jnp.asarray(is_rev_p)[None, :], keys != rck,
                             keys != keys_raw)
        valid = ~wamb_p & (d_lens[:, None] >= np.int32(ul))
        return keys, valid, flip_req

    keys, valid, flip_req = stage_keys()
    force((keys, valid, flip_req))

    @jax.jit
    def stage_gather():
        return V.gather_hits(keys, valid, al.d_bucket_start, al.d_comb, bb0,
                             params, al.d_sub_base, al.d_sub_lo, e0, st0,
                             probe_orient=flip_req)

    hit_pos, hit_valid, trunc = stage_gather()
    force((hit_pos, hit_valid))

    H = params.max_hits
    P = 2 * P0
    C = P * H
    ownoff_np = np.concatenate([offs_f, offs_f])
    off_r = np.repeat(ownoff_np, H)[None, :]
    is_rev_p = np.arange(P) >= P0
    strand3_np = np.repeat(is_rev_p.astype(np.uint32), H)[None, :]
    sn_np = np.tile(np.arange(P0, dtype=np.int32), 2)
    subid_r = np.repeat(sn_np.astype(np.uint32), H)[None, :]
    pk3_np = np.repeat(np.concatenate([np.arange(P0), np.arange(P0)]).astype(np.uint32), H)[None, :]

    @jax.jit
    def stage_kv():
        off3 = jnp.broadcast_to(jnp.asarray(off_r), (R_, C)).astype(jnp.int32)
        kv3 = jnp.where(hit_valid, hit_pos - off3.astype(jnp.uint32), V.SENTINEL)
        payload = (
            off3.astype(jnp.uint32)
            | (jnp.broadcast_to(jnp.asarray(strand3_np), (R_, C)) << np.uint32(12))
            | (jnp.asarray(subid_r) << np.uint32(13))
            | (jnp.asarray(pk3_np) << np.uint32(19))
        )
        return kv3, payload

    R_ = n
    kv3, payload = stage_kv()
    force((kv3, payload))

    @jax.jit
    def stage_sort():
        return jax.lax.sort((kv3, payload), dimension=-1, num_keys=1)

    @jax.jit
    def stage_merged():
        return V._vote_merged(kv3, payload, params, P0)

    @jax.jit
    def full_vote():
        return V.vote_batch(dc, da, d_lens, al.d_bucket_start, al.d_comb, bb0,
                            params, static_len=ul, sub_base=al.d_sub_base,
                            sub_lo=al.d_sub_lo, sub_bits=e0, search_steps=st0)

    nval = int(np.asarray(jax.device_get(jnp.sum(hit_valid.astype(jnp.int32), axis=1)
                                          ).astype(np.int64)).mean())
    mx = int(np.asarray(jax.device_get(jnp.max(jnp.sum(hit_valid.astype(jnp.int32), axis=1)))))
    q99 = int(np.percentile(np.asarray(jax.device_get(jnp.sum(hit_valid.astype(jnp.int32), axis=1))), 99))
    print(f"valid candidates/read: mean {nval}  p99 {q99}  max {mx}  (C={C})")
    timeit("keys", stage_keys)
    timeit("keys+gather", stage_gather)
    timeit("kv/payload", stage_kv)
    timeit("sort [R,320]", stage_sort)
    timeit("_vote_merged (sort+windows)", stage_merged)
    timeit("FULL vote_batch", full_vote)


if __name__ == "__main__":
    main()
