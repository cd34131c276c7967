"""Reference on-disk index interchange ({prefix}.NN.b.tab / .array / .reads).

Byte-exact writer and reader for the Subread VER2 ("2subindx") format,
SURVEY.md Appendix B / sorted-hashtable.c:1700-1908:

  .tab   : magic "2subindx", option cells (0x0102 padding, 0x0101 index_gap,
           0x0000 terminator), int64 items, int32 buckets_number, then per
           bucket int32 items, int32 space(==items), int16 sorted short
           keys, uint32 positions, trailing int8 is_small_table.
           In-bucket sort: key ascending; ties by position ascending when
           ((full_key % 791) % 2 == 0) else descending (is_1_greater_than_2,
           sorted-hashtable.c:1689-1698 — full_key = short*B + bucket).
  .array : uint32 start(=0), uint32 length, 2-bit packed bases LSB-first.
  .reads : text "<end_offset>\\t<name>" per contig.

The bucket count of a dump follows the reference builder's memory sizing:
-B (one block) forces memory_limit to 22000MB (full index) / 11500MB
(gapped) — index-builder.c:1173 — and
expected_items = memory_MB*1024/8*1024, buckets = items/31 (/3 if gap>=3)
rounded up to a number coprime with the primes <= 13
(calculate_buckets_by_size, sorted-hashtable.c:42-75).
"""

from __future__ import annotations

import struct

import numpy as np

from .. import dna
from .build import HashIndex, _stepped_kmers, native_layout
from .genome import Genome

GEHASH_BUCKET_LENGTH = 31  # sorted-hashtable.h:32 (VER2: 100 - 69)
MIN_BUCKETS_VER2 = 0x3FFFF + 4


def calculate_buckets(n_items: int, index_gap: int) -> int:
    """The reference's bucket-count rule (calculate_buckets_by_size,
    sorted-hashtable.c:42-75), used only for byte-exact dump interchange."""
    b = n_items // GEHASH_BUCKET_LENGTH
    if index_gap >= 3:
        b //= 3
    if b <= MIN_BUCKETS_VER2:
        b = MIN_BUCKETS_VER2
    while any(b % p == 0 for p in (2, 3, 5, 7, 11, 13)):
        b += 1
    return int(b)

SUBREAD_INDEX_OPTION_INDEX_GAP = 0x0101
SUBREAD_INDEX_OPTION_INDEX_PADDING = 0x0102


def reference_dump_buckets(index_gap: int, one_block: bool = True,
                           memory_mb: int | None = None) -> int:
    if memory_mb is None:
        memory_mb = 22000 if index_gap == 1 else 11500
    expected_items = int(memory_mb * 1024.0 / 8.0) * 1024
    b = expected_items // GEHASH_BUCKET_LENGTH
    if index_gap >= 3:
        b //= 3
    if b <= MIN_BUCKETS_VER2:
        b = MIN_BUCKETS_VER2
    while any(b % p == 0 for p in (2, 3, 5, 7, 11, 13)):
        b += 1
    return int(b)


def write_reference_tab(
    genome: Genome, path: str, index_gap: int = 1,
    repeat_threshold: int = 100, buckets: int | None = None,
) -> None:
    keys, pos = _stepped_kmers(genome, index_gap)

    # uninformative filter (scan_gene_index semantics: count > threshold)
    order = np.argsort(keys, kind="stable")
    ks, ps = keys[order], pos[order]
    boundaries = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    run_len = np.diff(np.concatenate((boundaries, [len(ks)])))
    keep = np.repeat(run_len <= repeat_threshold, run_len)
    ks, ps = ks[keep], ps[keep]

    B = buckets or reference_dump_buckets(index_gap)
    bucket = (ks % np.uint32(B)).astype(np.int64)
    short = (ks // np.uint32(B)).astype(np.int16)
    # tie order: position ascending iff (full_key % 791) even
    parity = (ks % np.uint32(791)) & np.uint32(1)
    pos_adj = np.where(parity == 0, ps, np.uint32(0xFFFFFFFF) - ps)
    order2 = np.lexsort((pos_adj, short, bucket))
    bucket = bucket[order2]
    short = short[order2]
    ps = ps[order2]

    counts = np.bincount(bucket, minlength=B).astype(np.int64)
    item_start = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(counts, out=item_start[1:])

    n = len(ks)
    header = b"2subindx"
    header += struct.pack("<hhh", SUBREAD_INDEX_OPTION_INDEX_PADDING, 2,
                          genome.padding)
    header += struct.pack("<hhh", SUBREAD_INDEX_OPTION_INDEX_GAP, 2, index_gap)
    header += struct.pack("<h", 0)
    header += struct.pack("<q", n)
    header += struct.pack("<i", B)

    # assemble the bucket stream in one numpy byte buffer:
    # per bucket: 8B header + 2B*count keys + 4B*count positions
    total_bytes = 8 * B + 6 * n
    buf = np.zeros(total_bytes, dtype=np.uint8)
    bucket_off = 8 * np.arange(B + 1, dtype=np.int64) + 6 * item_start
    # headers: (count, count) int32 pairs; empty buckets stay all-zero so
    # only the ~n nonempty headers need scattering (B can be ~93M)
    nonzero = np.flatnonzero(counts)
    nz_counts = counts[nonzero].astype(np.int32)
    hdr_pairs = np.empty((len(nonzero), 2), dtype="<i4")
    hdr_pairs[:, 0] = nz_counts
    hdr_pairs[:, 1] = nz_counts
    hdr_bytes = hdr_pairs.view(np.uint8)  # [nz, 8]
    hoff = bucket_off[nonzero]
    idx = hoff[:, None] + np.arange(8)[None, :]
    buf[idx.reshape(-1)] = hdr_bytes.reshape(-1)
    # keys and positions per bucket (contiguous runs)
    key_bytes = np.frombuffer(short.astype("<i2").tobytes(), dtype=np.uint8)
    pos_bytes = np.frombuffer(ps.astype("<u4").tobytes(), dtype=np.uint8)
    # byte offsets: keys of bucket b start at bucket_off[b]+8
    item_bucket = np.repeat(np.arange(B, dtype=np.int64)[nonzero], counts[nonzero])
    within = np.arange(n, dtype=np.int64) - item_start[item_bucket]
    kdst = (bucket_off[item_bucket] + 8 + 2 * within)
    buf[kdst] = key_bytes[0::2]
    buf[kdst + 1] = key_bytes[1::2]
    pdst = bucket_off[item_bucket] + 8 + 2 * counts[item_bucket] + 4 * within
    for j in range(4):
        buf[pdst + j] = pos_bytes[j::4]

    with open(path, "wb") as f:
        f.write(header)
        buf.tofile(f)
        f.write(struct.pack("<b", 0))  # is_small_table


def write_reference_array(genome: Genome, path: str) -> None:
    packed = dna.pack_2bit(genome.codes)
    length = genome.total
    nbytes = length // 4 + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<II", 0, length))
        out = np.zeros(nbytes, dtype=np.uint8)
        out[: len(packed)] = packed[:nbytes]
        out.tofile(f)


def write_reference_index(genome: Genome, prefix: str, index_gap: int = 1,
                          repeat_threshold: int = 100) -> None:
    """Emit {prefix}.00.b.tab/.array/.reads in the reference's format."""
    write_reference_tab(genome, f"{prefix}.00.b.tab", index_gap,
                        repeat_threshold)
    write_reference_array(genome, f"{prefix}.00.b.array")
    with open(prefix + ".reads", "w") as f:
        for e, n in zip(genome.ends, genome.names):
            f.write(f"{int(e)}\t{n}\n")


# --- reader ------------------------------------------------------------------


def read_reference_index(prefix: str, block: int = 0) -> tuple[Genome, HashIndex]:
    """Load a reference-built index block into native structures."""
    # .array → genome codes
    with open(f"{prefix}.{block:02d}.b.array", "rb") as f:
        start, length = struct.unpack("<II", f.read(8))
        packed = np.fromfile(f, dtype=np.uint8)
    codes = dna.unpack_2bit(packed, start + length)

    names, ends = [], []
    for line in open(prefix + ".reads"):
        e, name = line.rstrip("\n").split("\t")
        ends.append(int(e))
        names.append(name)
    ends_arr = np.asarray(ends, dtype=np.int64)

    with open(f"{prefix}.{block:02d}.b.tab", "rb") as f:
        magic = f.read(8)
        assert magic == b"2subindx", "only VER2 indexes supported"
        padding = 1210
        index_gap = 3
        while True:
            (key,) = struct.unpack("<h", f.read(2))
            if key == 0:
                break
            (ln,) = struct.unpack("<h", f.read(2))
            val = f.read(ln)
            if key == SUBREAD_INDEX_OPTION_INDEX_PADDING:
                padding = struct.unpack("<h", val)[0]
            elif key == SUBREAD_INDEX_OPTION_INDEX_GAP:
                index_gap = struct.unpack("<h", val)[0]
        (n_items,) = struct.unpack("<q", f.read(8))
        (B,) = struct.unpack("<i", f.read(4))
        rest = np.fromfile(f, dtype=np.uint8)

    # parse bucket stream vectorised: counts first (walk headers)
    counts = np.zeros(B, dtype=np.int64)
    off = 0
    keys_out = np.empty(n_items, dtype=np.int32)
    pos_out = np.empty(n_items, dtype=np.uint32)
    item = 0
    # walking 93M buckets in Python is too slow → stride-decode headers:
    # headers are not equally spaced, so do a fast loop in numpy chunks
    i32 = rest[: len(rest) - 1].view(np.uint8)
    pos = 0
    b = 0
    while b < B:
        cnt = int.from_bytes(i32[pos : pos + 4], "little")
        if cnt == 0:
            # count consecutive empty buckets in one vectorised probe:
            # empty buckets are 8 zero bytes each
            window = i32[pos : pos + 8 * 4096]
            wz = window.reshape(-1, 8) if len(window) % 8 == 0 else window[
                : len(window) // 8 * 8
            ].reshape(-1, 8)
            nz = np.flatnonzero(wz.any(axis=1))
            skip = int(nz[0]) if len(nz) else len(wz)
            skip = max(skip, 1)
            skip = min(skip, B - b)
            pos += 8 * skip
            b += skip
            continue
        keys_out[item : item + cnt] = (
            i32[pos + 8 : pos + 8 + 2 * cnt].view("<i2").astype(np.int32)
        )
        pos_out[item : item + cnt] = i32[
            pos + 8 + 2 * cnt : pos + 8 + 6 * cnt
        ].view("<u4")
        counts[b] = cnt
        item += cnt
        pos += 8 + 6 * cnt
        b += 1
    assert item == n_items, f"parsed {item} != {n_items}"

    bucket_start = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(counts, out=bucket_start[1:])

    # positions within equal keys may be in the scrambled dump order; the
    # vote kernel needs key-sorted buckets only, which the dump guarantees.
    starts = np.concatenate(([padding], ends_arr[:-1] + padding))
    lengths = ends_arr - starts - padding
    genome = Genome(
        names=names,
        starts=starts.astype(np.int64),
        lengths=lengths.astype(np.int64),
        ends=ends_arr,
        codes=codes,
        ambig=np.packbits(np.zeros(len(codes), bool), bitorder="little"),
        padding=padding,
    )
    # reconstruct full keys (key = short*B + bucket, sorted-hashtable.c:951)
    # and re-sort into the native high-bit-bucket device layout
    bucket_of = np.repeat(np.arange(B, dtype=np.uint64), counts)
    full = (keys_out.astype(np.uint64) * np.uint64(B) + bucket_of).astype(
        np.uint32
    )
    index = native_layout(full, pos_out, index_gap, padding)
    return genome, index
