"""Trace specific junction reads through voting/pair-selection/split-scan."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np
import jax.numpy as jnp

from subread_tpu.align.pipeline import Aligner, ReadBatch
from subread_tpu.config import subjunc_config
from subread_tpu.index.build import build_hash_index
from subread_tpu.index.genome import genome_from_fasta
from subread_tpu.io.fastq import read_fastq

NAMES = [
    "1102:19192:124747", "1103:10766:140827", "1102:15720:42769",
    "1102:18982:10764", "1101:3375:121611", "1102:3725:110196",
    "1104:6314:25000", "1101:15610:71772",
]

genome = genome_from_fasta("/root/reference/test/chr901.fa")
index = build_hash_index(genome, index_gap=1)
cfg = subjunc_config(batch_reads=64)
al = Aligner(genome, index, cfg)

full = read_fastq("/root/reference/test/subjunc/data/junction-reads-A.fq")
sel = []
names = []
for n in NAMES:
    for i, nm in enumerate(full.names):
        if n in nm:
            sel.append(i)
            names.append(n)
            break
sel = np.array(sel)
batch = ReadBatch(
    names=[full.names[i] for i in sel],
    codes=full.codes[sel], lengths=full.lengths[sel],
    quals=full.quals[sel], ambig=full.ambig[sel],
)

codes, ambig, lens, R = al._pad_batch(batch)
from subread_tpu import dna
words, amask = dna.pack_reads_host(codes, ambig)
d_words = jnp.asarray(words)
d_lens = jnp.asarray(lens)
L = codes.shape[1]

dcodes, dambig = al._unpack(d_words, jnp.asarray(amask), L)
from subread_tpu.ops.vote import vote_batch
bb0, e0, st0 = al.block_meta[0]
d_bs, d_cb, d_sb, d_sl = al.d_blocks[0]
v = vote_batch(dcodes, dambig, d_lens, d_bs, d_cb, bb0, al.vote_params,
               sub_base=d_sb, sub_lo=d_sl, sub_bits=e0, search_steps=st0)
for (bb, e, st), (b_bs, b_cb, b_sb, b_sl) in zip(al.block_meta[1:], al.d_blocks[1:]):
    vb = vote_batch(dcodes, dambig, d_lens, b_bs, b_cb, bb, al.vote_params,
                    sub_base=b_sb, sub_lo=b_sl, sub_bits=e, search_steps=st)
    v = al._merge_votes(v, vb)
sc = al._score_candidates(dcodes, dambig, d_lens, al.d_genome, v)

from subread_tpu.ops.junction import pick_junction_pair, junction_split_scan
from subread_tpu.align.pipeline import oriented_read

base = al._select_se(d_lens, sc)
pair = pick_junction_pair(v, sc, cfg.max_indel, read_len=d_lens)
oriented = oriented_read(dcodes, d_lens, base["strand"], None)
jr = junction_split_scan(al.d_genome, oriented, d_lens, pair["head_pos"],
                         pair["gap"], pair["valid"])

for i, n in enumerate(names):
    print(f"=== {n}")
    print("  votes:", np.asarray(v.votes[i]))
    print("  pos:  ", np.asarray(v.pos[i]).astype(np.int64))
    print("  strand:", np.asarray(v.strand[i]))
    print("  cov:  ", list(zip(np.asarray(v.cov_start[i]), np.asarray(v.cov_end[i]))))
    print("  base: mapped", bool(np.asarray(base['mapped'][i])),
          "pos", int(np.asarray(base['pos'][i])),
          "mism", int(np.asarray(base['mism'][i])),
          "clip", int(np.asarray(base['clip_l'][i])), int(np.asarray(base['clip_r'][i])))
    print("  pair: valid", bool(np.asarray(pair['valid'][i])),
          "head", int(np.asarray(pair['head_pos'][i])),
          "gap", int(np.asarray(pair['gap'][i])),
          "ambiguous", bool(np.asarray(pair['ambiguous'][i])))
    print("  jr: ok", bool(np.asarray(jr['ok'][i])),
          "split", int(np.asarray(jr['split'][i])),
          "mism", int(np.asarray(jr['mism'][i])),
          "clips", int(np.asarray(jr['clip_l'][i])), int(np.asarray(jr['clip_r'][i])))

print("\n--- seed fields via _select_se_junc ---")
out = al._select_se_junc(dcodes, d_lens, al.d_genome, v, sc, None)
import numpy as _np
for i, n in enumerate(names):
    print(f"{n}: seed_ok={bool(_np.asarray(out['seed_ok'][i]))} "
          f"left={int(_np.asarray(out['seed_left'][i]))} "
          f"right={int(_np.asarray(out['seed_right'][i]))} "
          f"seed2_ok={bool(_np.asarray(out['seed2_ok'][i]))} "
          f"left2={int(_np.asarray(out['seed2_left'][i]))} "
          f"right2={int(_np.asarray(out['seed2_right'][i]))} "
          f"alt2_ok={bool(_np.asarray(out['alt2_ok'][i]))} "
          f"alt2_pos={int(_np.asarray(out['alt2_pos'][i]))}")
