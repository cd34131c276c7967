"""End-to-end alignment pipeline tests (the subread-align test analog:
truth encoded in read names, readname_ora_match.py semantics)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from subread_tpu.align.pipeline import Aligner
from subread_tpu.config import aligner_config
from subread_tpu.io.sam import cigar_read_span, parse_cigar
from subread_tpu.utils.simulate import simulate_reads, write_fastq


@pytest.fixture(scope="module")
def aligner(chr901_genome, chr901_index):
    return Aligner(
        chr901_genome, chr901_index, aligner_config(batch_reads=2048)
    )


def check_sam(path, n_reads, min_accuracy=0.95, min_sensitivity=0.95):
    ok = bad = unmapped = 0
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        flag = int(f[1])
        if flag & 0x4:
            unmapped += 1
            continue
        nm = f[0].split("_")
        p1, p2 = int(nm[1]), int(nm[2])
        if f[2] == "chr901" and (abs(p1 - int(f[3])) < 1200 or abs(p2 - int(f[3])) < 1200):
            ok += 1
        else:
            bad += 1
        # CIGAR must consume exactly the read length
        assert cigar_read_span(f[5]) == len(f[9]), line
    assert ok / max(ok + bad, 1) >= min_accuracy, f"accuracy {ok}/{ok+bad}"
    assert (ok + bad) / n_reads >= min_sensitivity, f"sensitivity {(ok+bad)}/{n_reads}"
    return ok, bad, unmapped


def test_se_with_errors(aligner, chr901_genome, tmp_path, rng):
    batch, _ = simulate_reads(chr901_genome, 2000, read_len=100, rng=rng, error_rate=0.01)
    fq = str(tmp_path / "se.fq")
    sam = str(tmp_path / "se.sam")
    write_fastq(fq, batch)
    summary = aligner.align_file(fq, sam)
    assert summary.total == 2000
    # chr901 contains exact duplicated blocks (~8% of positions, e.g.
    # offset +63220 repeats): reads from them are break-even multi-mappers
    # which the reference does not report by default (core.c:2760
    # highest_score_occurence>=2; its own SE fixture leaves 7.5% unmapped)
    check_sam(sam, 2000, min_accuracy=0.97, min_sensitivity=0.91)


def test_se_indel_reads(aligner, chr901_genome, tmp_path, rng):
    batch, _ = simulate_reads(
        chr901_genome, 2000, read_len=100, rng=rng, indel_rate=1.0, max_indel=4
    )
    fq = str(tmp_path / "indel.fq")
    sam = str(tmp_path / "indel.sam")
    write_fastq(fq, batch)
    summary = aligner.align_file(fq, sam)
    check_sam(sam, 2000, min_accuracy=0.95, min_sensitivity=0.90)
    # a decent share of reads must carry I/D CIGARs
    n_indel_cigars = 0
    for line in open(sam):
        if line.startswith("@"):
            continue
        ops = {op for _, op in parse_cigar(line.split("\t")[5])}
        if "I" in ops or "D" in ops:
            n_indel_cigars += 1
    assert n_indel_cigars >= 1000, n_indel_cigars


def test_pe_proper_pairs(aligner, chr901_genome, tmp_path, rng):
    b1, b2 = simulate_reads(
        chr901_genome, 2048, read_len=100, rng=rng, error_rate=0.01, paired=True
    )
    fq1, fq2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    write_fastq(fq1, b1, suffix="/1")
    write_fastq(fq2, b2, suffix="/2")
    sam = str(tmp_path / "pe.sam")
    summary = aligner.align_file_pe(fq1, fq2, sam)
    assert summary.total == 2 * 2048
    ok, bad, unm = check_sam(sam, 2 * 2048, min_accuracy=0.96, min_sensitivity=0.95)
    # PE flags sanity: paired bit everywhere, proper-pair majority, TLEN sane
    proper = tlen_ok = n = 0
    for line in open(sam):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        flag = int(f[1])
        assert flag & 0x1
        n += 1
        if flag & 0x2:
            proper += 1
            if f[8] != "0" and 50 <= abs(int(f[8])) <= 600:
                tlen_ok += 1
    assert proper / n > 0.9
    assert tlen_ok / max(proper, 1) > 0.99


def test_unmapped_random_reads(aligner, tmp_path):
    rng = np.random.default_rng(1234)
    from subread_tpu import dna
    from subread_tpu.io.fastq import batch_from_records

    seqs = [
        dna.decode(rng.integers(0, 4, size=100).astype(np.uint8)).encode()
        for _ in range(64)
    ]
    batch = batch_from_records(
        [f"rand{i}" for i in range(64)], seqs, [b"h" * 100] * 64
    )
    res = aligner.align_batch(batch)
    assert res["mapped"].sum() <= 3  # random seqs must not map


def test_multiblock_index_matches_single(chr901_genome, chr901_index, rng):
    """A memory-split index (vote merge across blocks, core.c:3562-3613)
    maps reads to the same positions as the single-block index."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.index.build import split_index_blocks
    from subread_tpu.utils.simulate import simulate_reads

    batch, _ = simulate_reads(chr901_genome, 256, read_len=100, rng=rng,
                              error_rate=0.01)
    cfg = aligner_config(batch_reads=256, pad_read_len=128)
    single = Aligner(chr901_genome, chr901_index, cfg).align_batch(batch)
    blocks = split_index_blocks(chr901_index, memory_mb=2)
    assert len(blocks) >= 2
    multi = Aligner(chr901_genome, blocks, cfg).align_batch(batch)
    same = (
        (single["pos"] == multi["pos"]) & (single["mapped"] == multi["mapped"])
    ) | (~single["mapped"] & ~multi["mapped"])
    # boundary-overlap tie-breaks may flip a couple of repeat reads
    assert same.mean() > 0.97, same.mean()
    assert multi["mapped"].sum() >= single["mapped"].sum() - 3


def test_multi_indel_cigar(tmp_path, chr901_genome, chr901_index, rng):
    """Reads with two separate deletions get a two-event CIGAR via the
    probe-kv section walk (indel_recorder analog, core-indel.c:1874)."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.utils.simulate import write_fastq
    from subread_tpu.io.fastq import ReadBatch
    from subread_tpu import dna

    g = chr901_genome
    lin = g.chro_to_linear(0, 500000)
    # read = genome[lin:lin+35] + genome[lin+37:lin+70] + genome[lin+72:lin+104]
    codes = np.concatenate([
        g.codes[lin : lin + 35],
        g.codes[lin + 37 : lin + 70],
        g.codes[lin + 72 : lin + 104],
    ])
    assert len(codes) == 100
    n = 8
    batch = ReadBatch(
        names=[f"mi{i}" for i in range(n)],
        codes=np.tile(codes, (n, 1)),
        lengths=np.full(n, 100, np.int32),
        quals=np.full((n, 100), ord("I"), np.uint8),
        ambig=np.zeros((n, 100), bool),
    )
    fq = tmp_path / "mi.fq"
    write_fastq(str(fq), batch)
    al = Aligner(g, chr901_index, aligner_config(batch_reads=256, pad_read_len=128))
    out = tmp_path / "mi.sam"
    al.align_file(str(fq), str(out))
    recs = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert len(recs) == n
    two_d = [r for r in recs if r[5].count("D") == 2]
    assert len(two_d) >= n - 1, [r[5] for r in recs]
    r = two_d[0]
    assert int(r[3]) == 500001, r[3]
    # both 2-base deletions recovered (exact split position can shift by a
    # base when flanking bases repeat — same alignment score)
    import re as _re

    ops = _re.findall(r"(\d+)([MIDNS])", r[5])
    ds = [int(n) for n, op in ops if op == "D"]
    ms = sum(int(n) for n, op in ops if op == "M")
    assert ds == [2, 2] and ms == 100, r[5]
    nm = [t for t in r if t.startswith("NM:i:")]
    assert nm and int(nm[0][5:].strip()) == 4


def test_long_indel_rescue(tmp_path, chr901_genome, chr901_index):
    """Indels beyond the 16bp device reach (-I > 16) are rescued by the
    soft-clip re-anchoring third iteration (align.longindel;
    do_iteration_three / finalise_long_insertions, core-indel.c:4389)."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.io.fastq import ReadBatch
    from subread_tpu.utils.simulate import write_fastq

    g = chr901_genome
    L, D, K = 100, 40, 20
    del_start = 300000          # genome offset (contig coords) of the deletion
    ins_at = 400000
    rng = np.random.default_rng(77)
    reads, names = [], []
    for j, x in enumerate(range(25, 76, 10)):   # breakpoint at read offset x
        lin = g.chro_to_linear(0, del_start - x)
        reads.append(np.concatenate([
            g.codes[lin : lin + x],
            g.codes[lin + x + D : lin + x + D + (L - x)],
        ]))
        names.append(f"del{j}_{x}")
    for j, x in enumerate(range(25, 66, 10)):
        lin = g.chro_to_linear(0, ins_at - x)
        ins = rng.integers(0, 4, K).astype(np.uint8)
        reads.append(np.concatenate([
            g.codes[lin : lin + x], ins,
            g.codes[lin + x : lin + x + (L - x - K)],
        ]))
        names.append(f"ins{j}_{x}")
    n = len(reads)
    batch = ReadBatch(
        names=names,
        codes=np.stack(reads),
        lengths=np.full(n, L, np.int32),
        quals=np.full((n, L), ord("I"), np.uint8),
        ambig=np.zeros((n, L), bool),
    )
    fq = tmp_path / "li.fq"
    write_fastq(str(fq), batch)
    al = Aligner(
        g, chr901_index,
        aligner_config(batch_reads=256, pad_read_len=128, max_indel=60),
    )
    out = tmp_path / "li.sam"
    al.align_file(str(fq), str(out))
    recs = {r[0]: r for r in
            (l.split("\t") for l in open(out) if not l.startswith("@"))}
    n_del = sum(1 for nm, r in recs.items()
                if nm.startswith("del") and f"{D}D" in r[5])
    n_ins = sum(1 for nm, r in recs.items()
                if nm.startswith("ins") and f"{K}I" in r[5])
    assert n_del >= 5, {nm: r[5] for nm, r in recs.items() if nm.startswith("del")}
    assert n_ins >= 4, {nm: r[5] for nm, r in recs.items() if nm.startswith("ins")}
    vcf = open(str(out) + ".indel.vcf").read()
    assert any(str(del_start) in l and len(l.split("\t")[3]) == D + 1
               for l in vcf.splitlines() if not l.startswith("#")), vcf


def test_pe_native_emit_matches_python(tmp_path, chr901_genome, chr901_index):
    """The native PE SAM emitter (format_sam_records mate columns) and the
    python loop produce byte-identical output and equal counters."""
    import filecmp
    import pathlib

    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    here = pathlib.Path(__file__).parent
    r1 = str(here / "data" / "sim10k-pe-chr901-r1.fq.gz")
    r2 = str(here / "data" / "sim10k-pe-chr901-r2.fq.gz")
    a = Aligner(chr901_genome, chr901_index, aligner_config(batch_reads=2048))
    s1 = a.align_file_pe(r1, r2, str(tmp_path / "nat.sam"))
    b = Aligner(chr901_genome, chr901_index, aligner_config(batch_reads=2048))
    b._emit_sam_pe_native = lambda *args, **kw: False
    s2 = b.align_file_pe(r1, r2, str(tmp_path / "py.sam"))
    assert filecmp.cmp(tmp_path / "nat.sam", tmp_path / "py.sam",
                       shallow=False)
    d1, d2 = s1.as_dict(), s2.as_dict()
    for k in d1:
        if not k.startswith("time_"):
            assert d1[k] == d2[k], k


def test_multi_best_reporting(tmp_path, chr901_genome):
    """-B N: a read matching two genome copies is reported at both, the
    secondary flagged 0x100, both carrying HI/NH tags (MAPQ 0)."""
    import dataclasses

    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.index.build import build_hash_index

    g = chr901_genome
    codes = np.asarray(g.codes).copy()
    src = codes[200000 + g.padding : 200100 + g.padding]
    codes[700000 + g.padding : 700100 + g.padding] = src
    g2 = dataclasses.replace(g, codes=codes)
    idx = build_hash_index(g2, index_gap=1)
    fq = tmp_path / "m.fq"
    s = "".join("AGCT"[c] for c in src)
    fq.write_text(f"@m0\n{s}\n+\n{'I' * 100}\n")
    al = Aligner(g2, idx,
                 aligner_config(batch_reads=256, pad_read_len=128,
                                multi_best=4))
    out = tmp_path / "m.sam"
    al.align_file(str(fq), str(out))
    recs = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert len(recs) == 2
    poss = sorted(int(r[3]) for r in recs)
    assert poss == [200001, 700001]
    flags = sorted(int(r[1]) & 0x100 for r in recs)
    assert flags == [0, 0x100]
    for r in recs:
        tags = {t.split(":")[0] for t in r[11:]}
        assert {"HI", "NH"} <= tags
        assert int(r[4]) == 0  # MAPQ 0 for multi-mapping


def test_native_dp_matches_python_oracle():
    """native/dpalign.cpp must reproduce core_dynamic_align (itself the
    reference core-indel.c:4573 port) cell-for-cell on random windows."""
    import numpy as np

    from subread_tpu.align.indelevent import (
        core_dynamic_align, dp_align_jobs,
    )
    from subread_tpu.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    jobs = []
    for _ in range(300):
        m = int(rng.integers(3, 60))
        off = int(rng.integers(-8, 9))
        rows = m + off
        g = rng.integers(0, 4, size=max(rows, 1) + 4).astype(np.uint8)
        # reads derived from the genome with an actual indel + noise so
        # the DP exercises all movement codes
        if off >= 0:
            r = np.concatenate([g[: m // 2], g[m // 2 + off : m + off]])[:m]
        else:
            ins = rng.integers(0, 4, size=-off).astype(np.uint8)
            r = np.concatenate([g[: m // 2], ins, g[m // 2 :]])[:m]
        r = r.copy()
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, m))] = int(rng.integers(0, 4))
        jobs.append((r.astype(np.uint8), g, off))
    batch = dp_align_jobs(jobs, max_indel=16)
    for (r, g, off), got in zip(jobs, batch):
        want = core_dynamic_align(r, g, off, 16)
        assert got == want, (r.tolist(), g.tolist(), off)


def test_ref_stats_batch_matches_scalar():
    """ref_stats_batch_np must agree with ref_stats_host (the reference
    find_soft_clipping/final_CIGAR_quality port) on random single-event
    inputs."""
    import numpy as np

    from subread_tpu.align.indelevent import ref_stats_batch_np, ref_stats_host

    rng = np.random.default_rng(11)
    N, L = 400, 100
    mm = rng.random((N, L)) < 0.06
    split = rng.integers(1, L - 6, size=N).astype(np.int64)
    ind = rng.integers(-5, 6, size=N).astype(np.int64)
    ind[ind == 0] = 3   # the caller only places genuine indel events
    cs = rng.integers(-1, L, size=N).astype(np.int64)
    ce = rng.integers(0, L + 4, size=N).astype(np.int64)
    lens = np.full(N, L, np.int64)
    # zero the inter-section gap exactly as the caller builds mm
    for k in range(N):
        mm[k, split[k]: split[k] + max(0, -ind[k])] = False
    h, t, mi, ma = ref_stats_batch_np(mm, lens, split, ind, cs, ce)
    for k in range(N):
        want = ref_stats_host(
            mm[k], None, L, [int(split[k])], [int(ind[k])],
            int(cs[k]), int(ce[k]),
        )
        got = (int(h[k]), int(t[k]), int(mi[k]), int(ma[k]))
        assert got == tuple(int(x) for x in want), (k, got, want)


def test_native_event_walk_matches_python():
    import numpy as np

    from subread_tpu.align.indelevent import (
        _events_from_moves, core_dynamic_align, dp_events_jobs,
    )
    from subread_tpu.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(17)
    jobs, metas = [], []
    for _ in range(200):
        m = int(rng.integers(6, 50))
        off = int(rng.integers(-6, 7)) or 2
        g = rng.integers(0, 4, size=m + abs(off) + 4).astype(np.uint8)
        if off >= 0:
            r = np.concatenate([g[: m // 2], g[m // 2 + off : m + off]])[:m]
        else:
            ins = rng.integers(0, 4, size=-off).astype(np.uint8)
            r = np.concatenate([g[: m // 2], ins, g[m // 2 :]])[:m]
        r = r.copy()
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, m))] = int(rng.integers(0, 4))
        jobs.append((r.astype(np.uint8), g, off))
        metas.append((int(rng.integers(10_000, 20_000)), int(rng.integers(0, 40))))
    got = dp_events_jobs(jobs, metas, max_indel=16)
    for (r, g, off), (gs, rs), ev in zip(jobs, metas, got):
        mv = core_dynamic_align(r, g, off, 16)
        want = None if mv is None else _events_from_moves(mv, gs, rs)
        assert ev == want, (off, ev, want)
