"""sublong long-read mapping test on simulated 2-10kb reads."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from subread_tpu import dna


def test_long_reads(tmp_path, chr901_genome, chr901_index, rng):
    from subread_tpu.align.longread import sublong_file
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    g = chr901_genome
    fq = tmp_path / "long.fq"
    n = 24
    truths = []
    with open(fq, "w") as f:
        for i in range(n):
            L = int(rng.integers(2000, 8000))
            pos = int(rng.integers(0, int(g.lengths[0]) - L - 1))
            lin = g.chro_to_linear(0, pos)
            codes = g.codes[lin : lin + L].copy()
            # 2% error to be realistic-ish for long reads
            err = rng.random(L) < 0.02
            codes[err] = (codes[err] + rng.integers(1, 4, size=err.sum())) % 4
            if i % 2:
                codes = dna.revcomp(codes)
            truths.append((pos + 1, L))
            f.write(f"@lr{i}_{pos + 1}\n{dna.decode(codes)}\n+\n{'I' * L}\n")

    al = Aligner(g, chr901_index, aligner_config(batch_reads=2048, min_votes=2))
    out = tmp_path / "long.sam"
    mapped, total = sublong_file(al, str(fq), str(out))
    assert total == n
    assert mapped >= n - 2

    ok = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        fds = line.split("\t")
        if int(fds[1]) & 0x4:
            continue
        truth = int(fds[0].split("_")[1])
        if abs(int(fds[3]) - truth) < 1200:
            ok += 1
    assert ok >= mapped - 2, f"{ok}/{mapped} correct positions"


def test_long_read_deletion_event(tmp_path, chr901_genome, chr901_index, rng):
    """A long read skipping 300 genome bases between two chained windows
    gets a D/N CIGAR event (LRMchro-event analog)."""
    from subread_tpu.align.longread import map_long_reads
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.io.sam import cigar_reference_span

    g = chr901_genome
    lin = g.chro_to_linear(0, 400000)
    DEL = 300
    codes = np.concatenate([
        g.codes[lin : lin + 1000],
        g.codes[lin + 1000 + DEL : lin + 2000 + DEL],
    ])
    al = Aligner(g, chr901_index, aligner_config(batch_reads=2048, min_votes=2))
    hits = map_long_reads(al, [codes])
    h = hits[0]
    assert h.mapped and h.strand == 0
    assert abs(h.pos - lin) <= 50
    ops = dict()
    for n_, op in h.cigar_ops:
        ops[op] = ops.get(op, 0) + n_
    # 300bp deletion >= MIN_INTRON -> written as N
    assert ops.get("N", 0) == DEL, h.cigar_ops
    # read bases consumed match the read length minus clips
    consumed = sum(n_ for n_, op in h.cigar_ops if op in "MI")
    assert consumed == len(codes) - h.clip_left - h.clip_right


def test_sequence_parallel_long_read_matches_single_device(
    chr901_genome, chr901_index, rng
):
    """One extreme read's windows sharded across an 8-device CPU mesh
    (SURVEY §5 long-context scaling) must chain identically to the
    single-device path."""
    from subread_tpu.align.longread import map_long_reads, map_long_reads_sharded
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    g = chr901_genome
    reads = []
    # one extreme read (120kbp -> 1200 windows, 150/chip; toward the
    # reference's 1.2Mbp LRM spec, LRMconfig.h:25) + a few medium ones
    for L in (120_000, 4_000, 2_500):
        pos = int(rng.integers(0, int(g.lengths[0]) - L - 1))
        lin = g.chro_to_linear(0, pos)
        codes = g.codes[lin : lin + L].copy()
        err = rng.random(L) < 0.02
        codes[err] = (codes[err] + rng.integers(1, 4, size=err.sum())) % 4
        reads.append(codes)
    reads.append(dna.revcomp(reads[0][:30_000]))  # rc half of the extreme read

    al = Aligner(g, chr901_index, aligner_config(batch_reads=2048, min_votes=2))
    mesh = make_mesh(8, devices=devs[:8])
    base = map_long_reads(al, reads)
    shard = map_long_reads_sharded(al, reads, mesh)
    for b, s in zip(base, shard):
        assert s.mapped == b.mapped
        if b.mapped:
            assert s.pos == b.pos and s.strand == b.strand
            assert s.cigar_ops == b.cigar_ops
            assert (s.clip_left, s.clip_right) == (b.clip_left, b.clip_right)
    assert base[0].mapped and base[0].n_windows >= 450


def test_sublong_truth_agreement_and_completeness(
    tmp_path, chr901_genome, chr901_index
):
    """50 simulated 2-20kb reads (2% error): >=94% clip-adjusted position
    agreement with the encoded truth, and >=95% of read bases aligned.
    (The reference binary on the same input maps 50/50 but aligns only
    ~20% of each read's bases, soft-clipping the rest; we chain the whole
    read.)"""
    import gzip as _gz
    import pathlib
    import re

    here = pathlib.Path(__file__).parent
    fq_gz = here / "data" / "long50-chr901.fq.gz"
    fq = tmp_path / "long50.fq"
    fq.write_bytes(_gz.decompress(fq_gz.read_bytes()))

    from subread_tpu.align.longread import sublong_file
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    al = Aligner(
        chr901_genome, chr901_index,
        aligner_config(batch_reads=2048, min_votes=2),
    )
    out = tmp_path / "out.sam"
    mapped, total = sublong_file(al, str(fq), str(out))
    assert total == 50 and mapped >= 47

    def lead_clip(cig):
        m = re.match(r"(\d+)S", cig)
        return int(m.group(1)) if m else 0

    def aligned(cig):
        return sum(int(n) for n, op in re.findall(r"(\d+)([A-Z])", cig)
                   if op == "M")

    ok = tot = ab = rl = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        tot += 1
        truth = int(f[0].split("_")[1]) - 1210
        start0 = int(f[3]) - 1 - lead_clip(f[5])
        if not (int(f[1]) & 4) and abs(start0 - truth) <= 50:
            ok += 1
        ab += aligned(f[5])
        rl += len(f[9]) if f[9] != "*" else 0
    assert ok >= 0.94 * tot, f"{ok}/{tot}"
    assert ab >= 0.95 * rl, f"aligned fraction {ab/max(rl,1):.2f}"


def test_sublong_ont_like_reads(tmp_path, chr901_genome, chr901_index):
    """ONT-like reads (3% del, 3% ins, 3% sub; 3-12kb): all mapped at the
    encoded truth with >=80% of bases aligned (the reference binary maps
    them but aligns only one ~2kb window per read)."""
    import gzip as _gz
    import pathlib
    import re

    here = pathlib.Path(__file__).parent
    fq = tmp_path / "ont.fq"
    fq.write_bytes(_gz.decompress(
        (here / "data" / "ont20-chr901.fq.gz").read_bytes()
    ))
    from subread_tpu.align.longread import sublong_file
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    al = Aligner(chr901_genome, chr901_index,
                 aligner_config(batch_reads=2048, min_votes=2))
    out = tmp_path / "out.sam"
    mapped, total = sublong_file(al, str(fq), str(out))
    assert total == 20 and mapped == 20

    def lead(c):
        m = re.match(r"(\d+)S", c)
        return int(m.group(1)) if m else 0

    ok = ab = rl = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        truth = int(f[0].split("_")[1]) - 1210
        if not (int(f[1]) & 4) and abs(int(f[3]) - 1 - lead(f[5]) - truth) <= 100:
            ok += 1
        ab += sum(int(n) for n, op in re.findall(r"(\d+)([A-Z])", f[5])
                  if op == "M")
        rl += len(f[9]) if f[9] != "*" else 0
    assert ok == 20
    assert ab >= 0.8 * rl

    # base-level identity >= 0.9: replay each CIGAR against the genome
    # (between-anchor banded refinement places the ONT indels; without
    # it the M runs drift after every unplaced indel)
    from subread_tpu import dna as _dna

    g = chr901_genome
    match = aligned_m = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        if int(f[1]) & 4:
            continue
        seq = _dna.encode(f[9])
        lin = g.chro_to_linear(0, int(f[3]) - 1)
        rp = 0
        gp = lin
        for n, op in re.findall(r"(\d+)([A-Z])", f[5]):
            n = int(n)
            if op == "M":
                nn = min(n, len(seq) - rp, len(g.codes) - gp)
                match += int(
                    (seq[rp : rp + nn] == g.codes[gp : gp + nn]).sum()
                )
                aligned_m += nn
                rp += n
                gp += n
            elif op in "DN":
                gp += n
            elif op in "IS":
                rp += n
    identity = match / max(aligned_m, 1)
    assert identity >= 0.9, f"base identity {identity:.3f}"


def test_sublong_megabase_read(rng):
    """One 1.2 Mbp read — the reference LRM's spec ceiling
    (longread-one/LRMconfig.h:25 MAX_READ_LENGTH) — sharded across the
    8-device CPU mesh: 12,000 windows over the mesh, chained to one
    alignment at the true position."""
    import jax

    import numpy as np

    from subread_tpu import dna
    from subread_tpu.align.longread import (
        map_long_reads, map_long_reads_sharded,
    )
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.index.genome import build_genome
    from subread_tpu.io.fasta import Contig
    from subread_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    n_bases = 1_500_000
    codes = rng.integers(0, 4, n_bases).astype(np.uint8)
    genome = build_genome([
        Contig(name="mb1", codes=codes, ambig=np.zeros(n_bases, bool))
    ])
    index = build_hash_index(genome, index_gap=1)
    al = Aligner(genome, index, aligner_config(batch_reads=2048,
                                               min_votes=2))
    L = 1_200_000
    start = 123_456
    lin = genome.chro_to_linear(0, start)
    read = genome.codes[lin : lin + L].copy()
    err = rng.random(L) < 0.02
    read[err] = (read[err] + rng.integers(1, 4, size=int(err.sum()))) % 4

    mesh = make_mesh(8, devices=devs[:8])
    hits = map_long_reads_sharded(al, [read], mesh)
    h = hits[0]
    assert h.mapped
    assert abs((h.pos - lin)) <= 200
    assert h.n_windows >= 9000, h.n_windows
    span = sum(n for n, op in h.cigar_ops if op in "MDN")
    assert abs(span - L) <= 6000
    # bit-identical to the single-device chain
    base = map_long_reads(al, [read])[0]
    assert (h.pos, h.strand, h.cigar_ops) == (
        base.pos, base.strand, base.cigar_ops
    )


def test_sublong_vs_reference_binary(tmp_path, chr901_genome, chr901_index):
    """Position-level parity against the reference sublong binary
    (VERDICT r4 item 7).  Fixture long50-chr901.ref-sublong.tsv.gz =
    `sublong -i <full one-block chr901 index> -r long50.fq -o out.bam`
    (v2.0.6, 50/50 mapped): per read qname/flag/pos0/lead-clip/aligned-M/
    CIGAR.  Gates: every reference-mapped read maps for us too, >=94%
    agree on the clip-adjusted alignment start within 50bp and on strand,
    and our aligned-M coverage is at least the binary's on >=90% of reads
    (the LRM chains only the densest window run and soft-clips the rest,
    longread-mapping.c:529-660; our chain covers the whole read)."""
    import gzip as _gz
    import pathlib
    import re

    here = pathlib.Path(__file__).parent
    fq = tmp_path / "long50.fq"
    fq.write_bytes(_gz.decompress(
        (here / "data" / "long50-chr901.fq.gz").read_bytes()
    ))
    ref = {}
    with _gz.open(here / "data" / "long50-chr901.ref-sublong.tsv.gz",
                  "rt") as f:
        for line in f:
            q, flag, pos, lead, mlen, cig = line.rstrip("\n").split("\t")
            ref[q] = (int(flag), int(pos), int(lead), int(mlen))

    from subread_tpu.align.longread import sublong_file
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    al = Aligner(chr901_genome, chr901_index,
                 aligner_config(batch_reads=2048, min_votes=2))
    out = tmp_path / "ours.sam"
    mapped, total = sublong_file(al, str(fq), str(out))

    def lead_clip(cig):
        m = re.match(r"(\d+)S", cig)
        return int(m.group(1)) if m else 0

    agree = covered = tot = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        r = ref.get(f[0])
        if r is None:
            continue
        tot += 1
        rflag, rpos, rlead, rmlen = r
        if int(f[1]) & 4:
            continue
        start0 = int(f[3]) - 1 - lead_clip(f[5])
        ref_start0 = rpos - rlead
        same_strand = (int(f[1]) & 16) == (rflag & 16)
        if same_strand and abs(start0 - ref_start0) <= 50:
            agree += 1
        mlen = sum(int(n) for n, op in re.findall(r"(\d+)([A-Z])", f[5])
                   if op == "M")
        if mlen >= rmlen:
            covered += 1
    assert tot == len(ref), f"missing reads: {tot}/{len(ref)}"
    assert agree >= 0.94 * tot, f"binary position agreement {agree}/{tot}"
    assert covered >= 0.90 * tot, f"aligned-M coverage {covered}/{tot}"
