"""Tunnel-perf experiment: sub-batch size sweep for the SE align loop.

Run on the real chip when the tunnel is up:
    python profile_batchsize.py

Measures end-to-end reads/s of the bench.py streaming pattern at several
batch_reads settings.  Rationale: each 16K sub-batch costs ~3 dispatches
(~100ms/65K-chunk tunnel slop total); doubling the sub-batch halves the
dispatch count if compute scales linearly (VMEM/HBM pressure may say no).
"""

import json
import time

import numpy as np


def main():
    from subread_tpu.utils.jaxenv import ensure_compile_cache

    ensure_compile_cache()
    import jax

    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.index.genome import genome_from_fasta
    from subread_tpu.utils.simulate import simulate_reads

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    rng = np.random.default_rng(12345)
    n_reads = 1 << 16
    batch, _ = simulate_reads(
        genome, n_reads, read_len=100, rng=rng, error_rate=0.005
    )

    import itertools

    # max_hits sweep: 64 lifts SE conformance 99.26% -> 99.42% (repeat
    # probes beyond the 32-hit gather window); take it if the vote-gather
    # cost stays under ~5%
    for bs, mh in itertools.product((8192, 16384, 32768, 65536), (32, 64)):
        cfg = aligner_config(batch_reads=bs)
        b = batch
        if b.max_len < cfg.pad_read_len:
            import copy

            b = copy.copy(batch)
            pad = cfg.pad_read_len - batch.max_len
            b.codes = np.pad(batch.codes, ((0, 0), (0, pad)))
            b.quals = np.pad(batch.quals, ((0, 0), (0, pad)))
            b.ambig = np.pad(batch.ambig, ((0, 0), (0, pad)))
        aligner = Aligner(genome, index, cfg)
        aligner.vote_params = aligner.vote_params._replace(max_hits=mh)
        t0 = time.time()
        aligner.align_batch(b)  # warmup/compile
        t_compile = time.time() - t0
        reps = 3
        t0 = time.time()
        state = aligner.submit_batch(b)
        for _ in range(reps - 1):
            nxt = aligner.submit_batch(b)
            aligner.collect_batch(state)
            state = nxt
        aligner.collect_batch(state)
        dt = time.time() - t0
        rps = reps * n_reads / dt
        print(json.dumps({
            "batch_reads": bs, "max_hits": mh, "reads_per_sec": round(rps),
            "compile_s": round(t_compile, 1), "steady_s": round(dt, 2),
        }))


if __name__ == "__main__":
    main()
