"""Reference index-format interchange: byte-exact .tab/.array/.reads dumps.

The md5 constants below are of the artifacts produced by the reference
subread-buildindex v2.0.6 (compiled from /root/reference/src) with
`-B -F -M100 chr901.fa` — the same check test/subread-align-test.sh does.
"""

import hashlib
import pathlib

import numpy as np
import pytest

CHR901 = pathlib.Path("/root/reference/test/chr901.fa")

REF_MD5 = {
    ".00.b.array": "76f6c2a84c5097b13435bbeac4a8acd8",
    ".00.b.tab": "39cd407b95c866d7db864ce69a7d08fb",
    ".reads": "ba703ba9e328cdce4755d9c26f4a4b9d",
}


def md5(p):
    h = hashlib.md5()
    with open(p, "rb") as f:
        while True:
            b = f.read(1 << 24)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


@pytest.mark.skipif(not CHR901.exists(), reason="chr901.fa missing")
def test_reference_dump_md5(tmp_path, chr901_genome):
    from subread_tpu.index.interop import write_reference_index

    prefix = str(tmp_path / "small1")
    write_reference_index(chr901_genome, prefix, index_gap=1)
    for ext, want in REF_MD5.items():
        assert md5(prefix + ext) == want, f"{ext} differs from reference dump"


@pytest.mark.skipif(not CHR901.exists(), reason="chr901.fa missing")
def test_reference_roundtrip(tmp_path, chr901_genome, chr901_index):
    from subread_tpu.index.interop import (
        read_reference_index, write_reference_index,
    )

    prefix = str(tmp_path / "rt")
    write_reference_index(chr901_genome, prefix, index_gap=1)
    g2, i2 = read_reference_index(prefix)
    assert g2.names == chr901_genome.names
    assert np.array_equal(g2.ends, chr901_genome.ends)
    assert np.array_equal(g2.codes, chr901_genome.codes)
    assert i2.n_items == chr901_index.n_items
    # same (key → position multiset) content despite different bucket counts
    assert sorted(i2.positions.tolist()) == sorted(
        chr901_index.positions.tolist()
    )
