import numpy as np

from subread_tpu import dna


def test_encode_reference_convention():
    # base2int (reference subread.h:238): A=0, G=1, C=2, T=3
    assert list(dna.encode("AGCT")) == [0, 1, 2, 3]
    assert list(dna.encode("agct")) == [0, 1, 2, 3]
    # N maps like the reference macro ('N' >= 'G' and != 'G' → 3)
    assert list(dna.encode("N")) == [3]


def test_ambig_mask():
    assert list(dna.ambig_mask("ACGTN")) == [False, False, False, False, True]


def test_revcomp():
    codes = dna.encode("AAGCT")
    assert dna.decode(dna.revcomp(codes)) == "AGCTT"


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 3, 4, 5, 16, 17, 1000]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        packed = dna.pack_2bit(codes)
        assert np.array_equal(dna.unpack_2bit(packed, n), codes)


def test_pack_layout_matches_reference_array_format():
    # base i occupies bits (i%4)*2 within byte i//4 (gene-value-index.c:43)
    codes = dna.encode("TGCA")  # T=3, G=1, C=2, A=0
    packed = dna.pack_2bit(codes)
    assert packed[0] == (3 | (1 << 2) | (2 << 4) | (0 << 6))


def test_kmer_keys_big_endian_first():
    # genekey2int packs base 0 at bits 30-31 (input-files.c:1232)
    seq = "A" * 15 + "T"
    keys = dna.kmer_keys(dna.encode(seq))
    assert len(keys) == 1
    assert keys[0] == 3
    seq2 = "T" + "A" * 15
    assert dna.kmer_keys(dna.encode(seq2))[0] == np.uint32(3 << 30)


def test_kmer_keys_sliding():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=100).astype(np.uint8)
    keys = dna.kmer_keys(codes)
    assert len(keys) == 85
    # check a few against direct computation
    for i in [0, 7, 84]:
        k = 0
        for j in range(16):
            k = (k << 2) | int(codes[i + j])
        assert keys[i] == np.uint32(k)


def test_window_has_ambig():
    amb = np.zeros(30, dtype=bool)
    amb[20] = True
    w = dna.window_has_ambig(amb)
    assert w.shape == (15,)
    assert not w[0]
    assert all(w[5:])  # windows 5..14 include position 20
