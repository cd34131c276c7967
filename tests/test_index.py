import numpy as np
import pytest

from subread_tpu import dna
from subread_tpu.index.build import HashIndex, build_hash_index
from subread_tpu.index.interop import calculate_buckets
from subread_tpu.index.genome import PADDING, build_genome
from subread_tpu.io.fasta import Contig


def make_contig(name, seq):
    return Contig(name=name, codes=dna.encode(seq), ambig=dna.ambig_mask(seq))


def test_genome_layout_reference_convention():
    # reference convention with the 16-base window-prefill lag
    # (index-builder.c:130-213): ends[c] = start + len + pad - 16
    g = build_genome([make_contig("c0", "ACGT" * 10), make_contig("c1", "T" * 30)])
    assert g.starts[0] == PADDING
    assert g.ends[0] == PADDING + 40 + PADDING - 16
    assert g.starts[1] == g.ends[0] + PADDING
    assert g.ends[1] == g.starts[1] + 30 + PADDING - 16
    assert g.total == g.ends[1] + 16
    idx, off = g.linear_to_chro(np.array([g.starts[0] + 5, g.starts[1] + 7]))
    assert list(idx) == [0, 1]
    assert list(off) == [5, 7]


def test_calculate_buckets_reference_rule():
    b = calculate_buckets(1000, 1)
    assert b >= 0x3FFFF + 4
    for p in (2, 3, 5, 7, 11, 13):
        assert b % p != 0
    # short keys always fit 16 bits signed
    assert (2**32 - 1) // b < 32768


def test_hash_index_lookup_roundtrip(chr901_genome, chr901_index):
    g, idx = chr901_genome, chr901_index
    shift = 32 - idx.bucket_bits
    rng = np.random.default_rng(7)
    # pick random true genome positions, verify their 16-mer is findable
    s0 = int(g.starts[0])
    n_checked = 0
    for _ in range(300):
        p = int(rng.integers(s0, s0 + int(g.lengths[0]) - 16))
        from subread_tpu.index.build import revcomp_keys_np

        raw = dna.kmer_keys(g.codes[p : p + 16])[0]
        key = min(int(raw), int(revcomp_keys_np(np.asarray([raw]))[0]))
        b = int(key) >> shift
        lo, hi = int(idx.bucket_start[b]), int(idx.bucket_start[b + 1])
        seg = idx.keys[lo:hi]
        hits = [int(idx.positions[lo + j]) for j in np.flatnonzero(seg == key)]
        if not hits:
            # only allowed if the 16-mer was uninformative (>100 occurrences)
            all_keys = dna.kmer_keys(g.codes[s0 : s0 + int(g.lengths[0])])
            assert int((all_keys == key).sum()) > 100
        else:
            assert p in hits
            n_checked += 1
    assert n_checked > 250


def test_hash_index_globally_sorted(chr901_index):
    idx = chr901_index
    # high-bit buckets => entries globally sorted by (key, orient, position)
    comb = (
        (idx.keys.astype(np.uint64) << np.uint64(32))
        | (idx.orient.astype(np.uint64) << np.uint64(31))
        | idx.positions.astype(np.uint64)
    )
    assert np.all(np.diff(comb.astype(np.int64)) > 0)
    # check halfwords round-trip: (key remainder << 1) | orientation
    from subread_tpu.index.build import check16

    b = idx.check_words.view(np.uint16)[: idx.n_items]
    assert np.array_equal(b, check16(idx.keys, idx.orient, idx.bucket_bits))
    # remainder fits 15 bits so a check16 match IS a full (key, orient) match
    assert idx.bucket_bits >= 17
    rem = (idx.keys << np.uint32(idx.bucket_bits)) >> np.uint32(idx.bucket_bits)
    assert np.array_equal(b >> 1, rem.astype(np.uint16))
    assert np.array_equal((b & 1) != 0, idx.orient)


def test_index_save_load(tmp_path, chr901_genome, chr901_index):
    prefix = str(tmp_path / "idx")
    chr901_genome.save(prefix)
    chr901_index.save(prefix)
    from subread_tpu.index.genome import Genome

    g2 = Genome.load(prefix)
    i2 = HashIndex.load(prefix)
    assert g2.names == chr901_genome.names
    assert np.array_equal(g2.codes, chr901_genome.codes)
    assert i2.buckets_number == chr901_index.buckets_number
    assert np.array_equal(i2.positions, chr901_index.positions)
    # .reads text interchange file
    lines = open(prefix + ".reads").read().splitlines()
    assert lines[0] == f"{int(chr901_genome.ends[0])}\tchr901"


def test_uninformative_filter():
    # a genome that is one repeated 16-mer everywhere except a unique tail
    seq = "ACGT" * 200 + "ATTGCCGGAACCTTGGAATTCCGGAATTGGCC"
    g = build_genome([make_contig("rep", seq)])
    idx = build_hash_index(g, index_gap=1, repeat_threshold=100)
    # the ACGT-repeat 16mers occur ~197 times > 100 → dropped
    from subread_tpu.index.build import revcomp_keys_np

    raw = dna.kmer_keys(dna.encode("ACGT" * 4))[0]
    key_rep = min(int(raw), int(revcomp_keys_np(np.asarray([raw]))[0]))
    b = int(key_rep) >> (32 - idx.bucket_bits)
    lo, hi = int(idx.bucket_start[b]), int(idx.bucket_start[b + 1])
    assert key_rep not in idx.keys[lo:hi]
    assert idx.n_items > 0  # unique tail survived


def test_split_index_blocks_equivalence(chr901_genome, chr901_index):
    """A block-split index must reproduce single-block lookups: every
    position is findable in exactly the block(s) covering its range."""
    from subread_tpu.index.build import split_index_blocks

    blocks = split_index_blocks(chr901_index, memory_mb=2)  # force ~3 blocks
    assert len(blocks) >= 2
    total = sum(b.n_items for b in blocks)
    assert total >= chr901_index.n_items  # boundary overlap duplicates some
    # spot-check: random entries of the full index exist in some block
    rng = np.random.default_rng(5)
    for i in rng.integers(0, chr901_index.n_items, size=200):
        key = int(chr901_index.keys[i])
        pos = int(chr901_index.positions[i])
        found = False
        for b in blocks:
            bi = int(key) >> (32 - b.bucket_bits)
            lo, hi = int(b.bucket_start[bi]), int(b.bucket_start[bi + 1])
            seg = b.keys[lo:hi]
            hitpos = b.positions[lo:hi][seg == key]
            if pos in hitpos:
                found = True
                break
        assert found, (key, pos)
