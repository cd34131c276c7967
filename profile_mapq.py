"""Diagnose MAPQ divergences: dump our candidate table for reads whose
MAPQ disagrees with the reference fixture."""
import gzip
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))

DATA = pathlib.Path(__file__).parent / "tests" / "data"


def main():
    from subread_tpu.index.genome import genome_from_fasta
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.io.fastq import FastqReader

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    al = Aligner(genome, index, aligner_config(batch_reads=4096))

    # reference records
    ref = {}
    with gzip.open(DATA / "se20k-chr901.ref-full.tsv.gz", "rt") as f:
        for line in f:
            fds = line.rstrip("\n").split("\t")
            ref[fds[0]] = (int(fds[1]), int(fds[3]), int(fds[4]), fds[5],
                           fds[9:])

    rd = FastqReader(str(DATA / "sim20k-chr901.fq.gz"))
    batch = rd.next_batch(4096)
    res = al.align_batch(batch)
    import jax.numpy as jnp

    # recompute candidate tables for the divergent reads
    codes, ambig, lens, R = al._pad_batch(batch)
    from subread_tpu import dna
    words, amask = dna.pack_reads_host(codes, ambig)
    dc, da = al._unpack(jnp.asarray(words), jnp.asarray(amask), codes.shape[1])
    from subread_tpu.ops.vote import vote_batch
    v = vote_batch(dc, da, jnp.asarray(lens), al.d_bucket_start, al.d_comb,
                   al.index.bucket_bits, al.vote_params, static_len=100,
                   sub_base=al.d_sub_base, sub_lo=al.d_sub_lo,
                   sub_bits=al.block_meta[0][1],
                   search_steps=al.block_meta[0][2])
    votes = np.asarray(v.votes)[:R]
    poss = np.asarray(v.pos)[:R]

    cidx, coff = genome.linear_to_chro(np.asarray(res["pos"], np.int64))
    shown = 0
    for i, name in enumerate(batch.names):
        r = ref.get(name)
        if r is None or (r[0] & 4):
            continue
        if not res["mapped"][i]:
            continue
        mq_ref = r[2]
        mq_ours = int(res["mapq"][i])
        if mq_ours == mq_ref:
            continue
        nm_ref = [t for t in r[4] if t.startswith("NM")]
        print(f"{name}: ours mapq={mq_ours} mism={int(res['mism'][i])} "
              f"n_anch={int(res.get('n_anchors', np.zeros(len(batch.names)))[i])} "
              f"pos={int(coff[i])+1} | ref mapq={mq_ref} pos={r[1]} {nm_ref} "
              f"cig_ref={r[3]}")
        print(f"   cand votes={votes[i].tolist()} pos={poss[i].tolist()}")
        shown += 1
        if shown >= 25:
            break


if __name__ == "__main__":
    main()
