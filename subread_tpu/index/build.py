"""Sorted 16-mer hash index as flat arrays, built host-side with numpy.

Reference equivalents: `gehash_t` + builder (sorted-hashtable.c:77-281,
index-builder.c:78-445).  The reference stores per-bucket sorted short
keys + positions in 64K slab groups; the TPU-native layout is three flat
arrays designed for vectorised device binary search:

    bucket_start : int32 [B+1]  prefix offsets of each bucket's slab
    keys         : int32 [N]    in-bucket short key (key // B), sorted per bucket
    positions    : uint32[N]    linear genome position, ascending within equal keys

A 16-mer key k lives in bucket k % B with short key k // B (reference
sorted-hashtable.c:951, 191-192).  B is chosen with the reference's rule
(calculate_buckets_by_size, sorted-hashtable.c:42-75): items/31, /3 when
index_gap>=3, minimum 0x3ffff+4, rounded up to a number coprime with all
primes <= 13 — so that short keys always fit in 16 bits.

Uninformative 16-mers occurring more than `repeat_threshold` (=100) times
are excluded, mirroring scan_gene_index/add_repeated_subread
(index-builder.c:472,447).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import dna
from .genome import Genome, genome_from_fasta

REPEAT_THRESHOLD = 100  # reference index-builder default (-f 100)
GEHASH_BUCKET_LENGTH = 31  # sorted-hashtable.h:32 (VER2: 100 - 69)
MIN_BUCKETS_VER2 = 0x3FFFF + 4


def calculate_buckets(n_items: int, index_gap: int) -> int:
    b = n_items // GEHASH_BUCKET_LENGTH
    if index_gap >= 3:
        b //= 3
    if b <= MIN_BUCKETS_VER2:
        b = MIN_BUCKETS_VER2
    while any(b % p == 0 for p in (2, 3, 5, 7, 11, 13)):
        b += 1
    return int(b)


@dataclass
class HashIndex:
    buckets_number: int
    bucket_start: np.ndarray  # int32 [B+1]
    keys: np.ndarray          # int32 [N] (short key = full_key // B)
    positions: np.ndarray     # uint32 [N]
    index_gap: int
    padding: int
    max_bucket: int           # longest bucket (for binary-search depth)

    @property
    def n_items(self) -> int:
        return len(self.keys)

    def kp_pairs(self) -> np.ndarray:
        """Interleaved (short_key, position) int32 [N, 2] for the device's
        coalesced per-probe hit slices (ops.vote.gather_hits)."""
        return np.stack(
            [self.keys.astype(np.int32), self.positions.view(np.int32)], axis=1
        )

    def save(self, prefix: str) -> None:
        np.savez_compressed(
            prefix + ".hash.npz",
            buckets_number=np.int64(self.buckets_number),
            bucket_start=self.bucket_start,
            keys=self.keys.astype(np.int16),
            positions=self.positions,
            index_gap=np.int64(self.index_gap),
            padding=np.int64(self.padding),
            max_bucket=np.int64(self.max_bucket),
        )

    @classmethod
    def load(cls, prefix: str) -> "HashIndex":
        z = np.load(prefix + ".hash.npz")
        return cls(
            buckets_number=int(z["buckets_number"]),
            bucket_start=z["bucket_start"],
            keys=z["keys"].astype(np.int32),
            positions=z["positions"],
            index_gap=int(z["index_gap"]),
            padding=int(z["padding"]),
            max_bucket=int(z["max_bucket"]),
        )


def _stepped_kmers(genome: Genome, gap: int) -> tuple[np.ndarray, np.ndarray]:
    """All (key, position) pairs at per-contig stepped offsets.

    No N-window skipping: the reference's FASTA sanity pass converts every
    non-ACGT genome character (including N) to 'A' before the scan
    (check_and_convert_FastA, index-builder.c:789+), so the scanned genome
    never contains N.  Long N runs become poly-A runs whose 16-mers are
    removed by the uninformative-mer filter instead."""
    all_keys = []
    all_pos = []
    for c in range(len(genome.names)):
        s = int(genome.starts[c])
        length = int(genome.lengths[c])
        if length < dna.KMER:
            continue
        codes = genome.codes[s : s + length]
        keys = dna.kmer_keys(codes)  # [length-15]
        sel = np.arange(0, length - dna.KMER + 1, gap)
        all_keys.append(keys[sel])
        all_pos.append((sel + s).astype(np.uint32))
    if not all_keys:
        return np.zeros(0, np.uint32), np.zeros(0, np.uint32)
    return np.concatenate(all_keys), np.concatenate(all_pos)


def build_hash_index(
    genome: Genome,
    index_gap: int = 1,
    repeat_threshold: int = REPEAT_THRESHOLD,
) -> HashIndex:
    keys, pos = _stepped_kmers(genome, index_gap)

    # Uninformative-mer filter: drop keys occurring more than threshold times.
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    ps = pos[order]
    # run lengths over sorted keys
    boundaries = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    run_len = np.diff(np.concatenate((boundaries, [len(ks)])))
    keep_run = run_len <= repeat_threshold
    keep = np.repeat(keep_run, run_len)
    ks, ps = ks[keep], ps[keep]

    n = len(ks)
    B = calculate_buckets(n, index_gap)
    bucket = (ks % np.uint32(B)).astype(np.int64)
    short = (ks // np.uint32(B)).astype(np.int32)
    assert short.max(initial=0) < 32768, "short key must fit int16"

    # Final layout sort: (bucket, short_key, position).
    order2 = np.lexsort((ps, short, bucket))
    short = short[order2]
    ps = ps[order2]
    bucket = bucket[order2]

    counts = np.bincount(bucket, minlength=B)
    bucket_start = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(counts, out=bucket_start[1:])
    max_bucket = int(counts.max(initial=0))
    assert bucket_start[-1] < 2**31
    return HashIndex(
        buckets_number=B,
        bucket_start=bucket_start.astype(np.int32),
        keys=short,
        positions=ps,
        index_gap=index_gap,
        padding=genome.padding,
        max_bucket=max_bucket,
    )


def build_index(
    fasta_path: str,
    out_prefix: str | None = None,
    index_gap: int = 1,
    repeat_threshold: int = REPEAT_THRESHOLD,
) -> tuple[Genome, HashIndex]:
    """Full index build: FASTA → Genome + HashIndex (and save if prefix given).

    Reference: subread-buildindex main flow (index-builder.c:1014);
    `index_gap=1` is a full index (-F), 3 the default gapped index.
    """
    genome = genome_from_fasta(fasta_path)
    idx = build_hash_index(genome, index_gap=index_gap, repeat_threshold=repeat_threshold)
    if out_prefix:
        genome.save(out_prefix)
        idx.save(out_prefix)
    return genome, idx
