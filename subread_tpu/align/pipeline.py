"""The two-scan alignment pipeline.

Reference: `read_chunk_circles` (core.c:3539-3685) orchestrating
STEP_VOTING (`do_voting`, core.c:3049) and STEP_ITERATION_TWO
(`do_iteration_two`, core.c:2486) over 20M-read chunks, with pthread
data-parallelism.  TPU-first redesign:

  * a chunk is a dense [R, L] int8 batch resident in HBM;
  * scan 1 = `ops.vote.vote_batch` (one fused jit);
  * scan 2 = `_scan2` below (one fused jit): candidate scoring via the
    single-indel split scan, best-candidate selection with the reference's
    integer score (core.c:2731-2739), soft-clip bounds, MAPQ;
  * SAM text assembly happens host-side from small int arrays.

Data parallelism across chips shards the R axis (see parallel/), replacing
the reference's thread pool; the index is replicated when it fits HBM and
sharded otherwise (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxenv import ensure_compile_cache

ensure_compile_cache()

from .. import dna
from ..config import AlignConfig
from ..index.build import HashIndex
from ..index.genome import Genome
from ..io import sam as samio
from ..io.fastq import FastqReader, ReadBatch
from ..ops.extend import (
    genome_base,
    mismatch_matrix,
    oriented_read,
    place_single_indel,
)
from ..ops.vote import VoteParams, VoteResult, vote_batch


@dataclass
class AlignSummary:
    total: int = 0
    mapped: int = 0
    unique: int = 0
    multi: int = 0
    unmapped: int = 0
    indels: int = 0
    time_voting: float = 0.0
    time_realign: float = 0.0
    time_io: float = 0.0

    def as_dict(self):
        return self.__dict__.copy()


class Aligner:
    """Single-chip aligner; the multi-chip variant shards the batch axis."""

    def __init__(self, genome: Genome, index: HashIndex, cfg: AlignConfig):
        self.genome = genome
        self.index = index
        self.cfg = cfg
        self.vote_params = VoteParams(
            total_subreads=cfg.total_subreads,
            max_hits=cfg.max_hits_per_probe,
            indel_tolerance=max(cfg.max_indel, 1),
            top_k=cfg.top_k,
            index_gap=index.index_gap,
            search_iters=max(int(np.ceil(np.log2(max(index.max_bucket, 2)))) + 1, 4),
        )
        # device-resident index (replicated single-chip)
        self.d_bucket_start = jnp.asarray(index.bucket_start)
        self.d_keys = jnp.asarray(index.keys)
        self.d_positions = jnp.asarray(index.positions)
        self.d_genome = jnp.asarray(
            dna.packed_as_u32(dna.pack_2bit(genome.codes))
        )

    # --- device step -------------------------------------------------------
    # Index arrays are jit *arguments* (not closed-over constants): constants
    # would be inlined into the HLO, bloating compiles and defeating the
    # persistent compilation cache.  Scan 1 (vote) and scan 2 (realign) are
    # two separate jits: fusing them into one graph sends XLA's optimizer
    # into a tailspin (>>10min compiles) for no runtime benefit.

    def _device_align(
        self, codes, ambig, lens, bucket_start, keys, positions, genome_u32
    ):
        """Full single-end alignment step: votes + scan-2 selection.

        Returns per-read int arrays (best position, strand, cigar pieces,
        mismatches, mapq, flags related info).
        """
        v = vote_batch(
            codes, ambig, lens,
            bucket_start, keys, positions,
            self.index.buckets_number, self.vote_params,
        )
        return self._scan2(codes, ambig, lens, genome_u32, v)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _scan2(self, codes, ambig, lens, genome_u32, v: VoteResult):
        cfg = self.cfg
        R, L = codes.shape
        K = self.vote_params.top_k

        # orient reads once per strand; candidates flattened to one [R*K]
        # batched split-scan call (keeps the compiled graph small).
        fwd = codes
        rev = oriented_read(codes, lens, jnp.ones((R,), jnp.int32))

        pos_k = v.pos                     # [R, K] uint32
        strand_k = v.strand               # [R, K]
        indel_k = jnp.clip(
            (v.tail - v.pos).astype(jnp.int32), -cfg.max_indel, cfg.max_indel
        )

        oriented_k = jnp.where(
            strand_k[:, :, None] == 1, rev[:, None, :], fwd[:, None, :]
        )  # [R, K, L]
        flat = lambda a: a.reshape(R * K, *a.shape[2:])
        lens_k = jnp.broadcast_to(lens[:, None], (R, K))
        split_f, mism_f = place_single_indel(
            genome_u32,
            flat(oriented_k),
            flat(lens_k[:, :, None])[:, 0],
            flat(pos_k[:, :, None])[:, 0],
            flat(indel_k[:, :, None])[:, 0],
        )
        split_k = split_f.reshape(R, K)
        mism_k = mism_f.reshape(R, K)

        votes_k = v.votes
        valid_k = (votes_k >= cfg.min_votes) & (pos_k != np.uint32(0xFFFFFFFF))

        # realignment score (core.c:2731-2739): DNA = match*100000 +
        # (10000 - mismatch); candidates ranked identically by
        # (match - mismatch) since match = L - mismatch - inserted.
        ins_k = jnp.maximum(-indel_k, 0)
        match_k = jnp.maximum(lens[:, None] - ins_k - mism_k, 0)
        score_k = match_k * 100000 + (10000 - mism_k)
        score_k = jnp.where(valid_k, score_k, -1)

        best = jnp.argmax(score_k, axis=1)
        take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
        b_pos, b_strand = take(pos_k), take(strand_k)
        b_indel, b_split, b_mism = take(indel_k), take(split_k), take(mism_k)
        b_votes, b_score = take(votes_k), take(score_k)
        b_valid = take(valid_k)

        # mismatch gate: excessive mismatches → unmapped
        # (CORE_TOO_MANY_MISMATCHES analog); allow max_mismatches on the
        # best alignment.
        mapped = b_valid & (b_mism <= cfg.max_mismatches)

        # count equal-best candidates for multi-mapping / MAPQ
        n_best = jnp.sum((score_k == b_score[:, None]) & valid_k, axis=1)
        mapq = jnp.where(
            n_best > 1, 0, cfg.mapq_unique // (1 + jnp.maximum(b_mism, 0))
        ).astype(jnp.int32)

        return dict(
            pos=b_pos,
            strand=b_strand,
            indel=b_indel,
            split=b_split,
            mism=b_mism,
            votes=b_votes,
            mapped=mapped,
            multi=n_best > 1,
            mapq=mapq,
        )

    # --- host orchestration -------------------------------------------------

    def _pad_batch(self, batch: ReadBatch):
        cfg = self.cfg
        R = len(batch)
        Rp = -(-R // cfg.batch_reads) * cfg.batch_reads if R else cfg.batch_reads
        Lp = max(cfg.pad_read_len, batch.max_len)
        codes = np.zeros((Rp, Lp), np.uint8)
        ambig = np.zeros((Rp, Lp), bool)
        lens = np.zeros(Rp, np.int32)
        codes[:R, : batch.max_len] = batch.codes
        ambig[:R, : batch.max_len] = batch.ambig
        lens[:R] = batch.lengths
        return codes, ambig, lens, R

    def align_batch(self, batch: ReadBatch) -> dict[str, np.ndarray]:
        codes, ambig, lens, R = self._pad_batch(batch)
        out = {}
        n = len(lens)
        bs = self.cfg.batch_reads
        parts = []
        for i in range(0, n, bs):
            res = self._device_align(
                jnp.asarray(codes[i : i + bs]),
                jnp.asarray(ambig[i : i + bs]),
                jnp.asarray(lens[i : i + bs]),
                self.d_bucket_start,
                self.d_keys,
                self.d_positions,
                self.d_genome,
            )
            parts.append(jax.device_get(res))
        for key in parts[0]:
            out[key] = np.concatenate([p[key] for p in parts])[:R]
        return out

    def _emit_sam(
        self,
        writer: samio.SamWriter,
        batch: ReadBatch,
        res: dict[str, np.ndarray],
        summary: AlignSummary,
    ):
        g = self.genome
        lin = res["pos"].astype(np.int64)
        cidx, coff = g.linear_to_chro(lin)
        in_contig = (coff >= 0) & (coff < g.lengths[cidx])
        mapped = res["mapped"] & in_contig
        for i, name in enumerate(batch.names):
            L = int(batch.lengths[i])
            strand = int(res["strand"][i])
            seq_codes = batch.codes[i, :L]
            qual = batch.quals[i, :L].tobytes().decode()
            if strand == 1:
                seq = dna.decode(dna.revcomp(seq_codes))
                qual = qual[::-1]
            else:
                seq = dna.decode(seq_codes)
            summary.total += 1
            if not mapped[i]:
                summary.unmapped += 1
                writer.write(
                    samio.SamRecord(name, samio.FLAG_UNMAPPED, "*", 0, 0, "*",
                                    seq=seq, qual=qual)
                )
                continue
            summary.mapped += 1
            if res["multi"][i]:
                summary.multi += 1
            else:
                summary.unique += 1
            indel = int(res["indel"][i])
            split = int(res["split"][i])
            if indel > 0:
                cigar = f"{split}M{indel}D{L - split}M"
                summary.indels += 1
            elif indel < 0:
                ins = -indel
                cigar = f"{split}M{ins}I{L - split - ins}M"
                summary.indels += 1
            else:
                cigar = f"{L}M"
            flag = samio.FLAG_REVERSE if strand else 0
            nm = int(res["mism"][i]) + abs(indel)
            writer.write(
                samio.SamRecord(
                    name, flag, g.names[int(cidx[i])], int(coff[i]) + 1,
                    int(res["mapq"][i]), cigar, seq=seq, qual=qual,
                    tags=[f"NM:i:{nm}"],
                )
            )

    def align_file(
        self, fastq_path: str, out_sam: str, chunk_reads: int = 1 << 20
    ) -> AlignSummary:
        summary = AlignSummary()
        reader = FastqReader(fastq_path)
        writer = samio.SamWriter(
            out_sam,
            self.genome.names,
            [int(x) for x in self.genome.lengths],
            rg_id=self.cfg.rg_id,
            rg_extra=list(self.cfg.rg_extra) or None,
        )
        try:
            while True:
                t0 = time.time()
                batch = reader.next_batch(chunk_reads, pad_to=self.cfg.pad_read_len)
                if batch is None:
                    break
                t1 = time.time()
                res = self.align_batch(batch)
                t2 = time.time()
                self._emit_sam(writer, batch, res, summary)
                t3 = time.time()
                summary.time_io += (t1 - t0) + (t3 - t2)
                summary.time_voting += t2 - t1  # vote+realign fused on device
        finally:
            reader.close()
            writer.close()
        return summary
