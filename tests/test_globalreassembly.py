"""globalReassembly: greedy contig assembly (global-reassembly.c port)."""

import numpy as np

from subread_tpu import dna


def _write_fastq(path, reads, prefix="r"):
    with open(path, "w") as f:
        for i, codes in enumerate(reads):
            s = dna.decode(codes)
            f.write(f"@{prefix}{i}\n{s}\n+\n{'I' * len(s)}\n")


def test_assemble_single_contig(tmp_path, rng):
    """Tiled 100bp reads at 40bp spacing over a 2kb source reassemble into
    one contig covering (nearly) the whole source sequence."""
    from subread_tpu.tools.globalreassembly import main

    src = rng.integers(0, 4, 2000).astype(np.uint8)
    reads = [src[p : p + 100] for p in range(0, 1901, 40)]
    order = rng.permutation(len(reads))
    fq = tmp_path / "in.fq"
    _write_fastq(fq, [reads[i] for i in order])
    out = tmp_path / "contigs.fa"
    assert main(["-i", str(fq), "-o", str(out)]) == 0
    recs = open(out).read().strip().split("\n")
    assert len(recs) == 2 and recs[0].startswith(">SEQ0_LEN")
    contig = dna.encode(recs[1])
    # the assembled contig must be the source (either strand), allowing
    # the ends to be short by < one read length
    for cand in (contig, dna.revcomp(contig)):
        s = dna.decode(cand)
        if s in dna.decode(src):
            assert len(cand) >= 2000 - 100
            return
    raise AssertionError(
        f"contig (len {len(contig)}) is not a substring of the source"
    )


def test_two_contigs_and_min_length(tmp_path, rng):
    """Two disjoint sources yield two contigs; reportLength filters."""
    from subread_tpu.tools.globalreassembly import main

    srcs = [rng.integers(0, 4, n).astype(np.uint8) for n in (1200, 500)]
    reads = []
    for src in srcs:
        reads += [src[p : p + 100] for p in range(0, len(src) - 99, 30)]
    fq = tmp_path / "in.fq"
    _write_fastq(fq, reads)
    out = tmp_path / "contigs.fa"
    assert main(["-i", str(fq), "-o", str(out), "-L", "900"]) == 0
    headers = [l for l in open(out) if l.startswith(">")]
    assert len(headers) == 1  # only the 1200bp source passes -L 900
    assert main(["-i", str(fq), "-o", str(out), "-L", "400"]) == 0
    headers = [l for l in open(out) if l.startswith(">")]
    assert len(headers) == 2


def test_mismatch_gate_blocks_chimeras(tmp_path, rng):
    """Reads from two unrelated sequences sharing one seeded 16-mer do not
    chimerically join (full-overlap mismatch check, global-reassembly.c
    overlap mm gate)."""
    from subread_tpu.tools.globalreassembly import main

    a = rng.integers(0, 4, 600).astype(np.uint8)
    b = rng.integers(0, 4, 600).astype(np.uint8)
    b[300:316] = a[300:316]  # shared 16-mer, different context
    reads = [a[p : p + 100] for p in range(0, 501, 25)]
    reads += [b[p : p + 100] for p in range(0, 501, 25)]
    fq = tmp_path / "in.fq"
    _write_fastq(fq, reads)
    out = tmp_path / "contigs.fa"
    assert main(["-i", str(fq), "-o", str(out), "-L", "251"]) == 0
    lens = [int(l.split("_LEN")[1]) for l in open(out) if l.startswith(">")]
    assert len(lens) == 2 and all(500 <= n <= 650 for n in lens), lens
