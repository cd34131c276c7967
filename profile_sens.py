"""Diagnose the 1%-error sensitivity regression (test_se_with_errors).

For each unmapped/wrong read: is the true kv in the top-K vote table?
With how many votes?  Which gate dropped it (votes < min_first, tier,
mismatch cap, break-even)?
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np

from subread_tpu.align.pipeline import Aligner
from subread_tpu.config import aligner_config
from subread_tpu.index.build import build_hash_index
from subread_tpu.index.genome import genome_from_fasta
from subread_tpu.utils.simulate import simulate_reads

g = genome_from_fasta("/root/reference/test/chr901.fa")
idx = build_hash_index(g, index_gap=1)
rng = np.random.default_rng(901)
batch, truth = simulate_reads(g, 2000, read_len=100, rng=rng, error_rate=0.01)

al = Aligner(g, idx, aligner_config(batch_reads=2048))
res = al.align_batch(batch)

# truth: names encode chr901_p1_p2
p1 = np.array([int(n.split("_")[1]) for n in batch.names])
p2 = np.array([int(n.split("_")[2]) for n in batch.names])
mapped = np.asarray(res["mapped"], bool)
pos = np.asarray(res["pos"]).astype(np.int64)
# linear -> contig coords
lin0 = g.chro_to_linear(0, 0)
contig_pos = pos - lin0 + 1
ok = mapped & ((np.abs(contig_pos - p1) < 1200) | (np.abs(contig_pos - p2) < 1200))
print(f"mapped {mapped.sum()}/2000, ok {ok.sum()}, wrong {(mapped & ~ok).sum()}, "
      f"unmapped {(~mapped).sum()}")

bad = np.flatnonzero(~mapped)
print("first 30 unmapped:", bad[:30])

# re-vote the unmapped reads and inspect their top-K tables
import jax
import jax.numpy as jnp
from subread_tpu.ops.vote import vote_batch
from subread_tpu import dna

ii = bad[:256]
R = len(ii)
Lp = batch.max_len
codes = jnp.asarray(batch.codes[ii])
ambig = jnp.asarray(batch.ambig[ii])
lens = jnp.asarray(batch.lengths[ii])
v = vote_batch(codes, ambig, lens, al.d_bucket_start, al.d_comb,
               idx.bucket_bits, al.vote_params, static_len=100,
               sub_base=al.d_sub_base, sub_lo=al.d_sub_lo,
               sub_bits=al.block_meta[0][1], search_steps=al.block_meta[0][2])
vv = jax.device_get(v)
true_kv_f = (p1[ii] - 1) + lin0   # fwd read start in linear coords
true_kv_r = (p2[ii] - 1) + lin0 - 99 + 99  # rev reads: leftmost base
n_true_in_topk = 0
votes_hist = {}
for j in range(R):
    kvs = vv.pos[j].astype(np.int64)
    votes = vv.votes[j]
    t1 = true_kv_f[j]
    hit = np.abs(kvs - t1) <= 8
    if hit.any():
        n_true_in_topk += 1
        vmax = int(votes[hit].max())
    else:
        vmax = -1
    votes_hist[vmax] = votes_hist.get(vmax, 0) + 1
    if j < 15:
        print(f"read {ii[j]}: true~{t1} sat={bool(vv.saturated[j])} "
              f"topk kv={kvs - t1} votes={votes.tolist()}")
print("true-pos cluster in topK for", n_true_in_topk, "/", R)
print("vote count of true cluster histogram:", dict(sorted(votes_hist.items())))
