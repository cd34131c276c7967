import numpy as np, pytest
jax = pytest.importorskip("jax")


def test_junction_rescue_lifts_support(tmp_path, chr901_genome, chr901_index, rng):
    """Reads across a junction where one half is too short for its own
    vote cluster still get junction CIGARs via the shared event table
    (explain_read semantics, core-junction.c:2617)."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import subjunc_config
    from subread_tpu.io.fastq import ReadBatch
    from subread_tpu.utils.simulate import write_fastq
    from subread_tpu import dna

    g = chr901_genome
    # pick a junction site with canonical motifs: GT right after the left
    # edge, AG right before the right edge (discovery requires the motif,
    # donor_score core-junction.c:3675; rescue itself does not)
    G_, T_, A_ = 1, 3, 0
    base = g.chro_to_linear(0, 200000)
    seg = g.codes[base : base + 50000]
    gt = np.flatnonzero((seg[:-1] == G_) & (seg[1:] == T_))
    ag = np.flatnonzero((seg[:-1] == A_) & (seg[1:] == 1 + 1))  # G=1? no
    E = gap = None
    agset = set((np.flatnonzero((seg[:-1] == A_) & (seg[1:] == G_))).tolist())
    for d in gt:
        le = d - 1          # left edge (last exon base), 0-based in seg
        for cand_gap in range(4500, 5600):
            re_ = le + cand_gap  # right edge (first base of right exon)
            if re_ + 2 >= len(seg):
                break
            if (re_ - 2) in agset:  # AG occupies [re-2, re-1]
                E = base + le
                gap = cand_gap
                break
        if E is not None:
            break
    assert E is not None, "no GT..AG pair found in the window"
    rows, names = [], []
    # 20 "discovery" reads: split 50/50 (both halves voteable)
    for i in range(20):
        off = 50
        a = g.codes[E - off + 1 : E + 1]
        b = g.codes[E + gap : E + gap + (100 - off)]
        rows.append(np.concatenate([a, b])); names.append(f"disc{i}")
    # 20 "weak" reads: split 85/15 (tail too short to vote alone)
    for i in range(20):
        off = 85
        a = g.codes[E - off + 1 : E + 1]
        b = g.codes[E + gap : E + gap + (100 - off)]
        rows.append(np.concatenate([a, b])); names.append(f"weak{i}")
    codes = np.stack(rows).astype(np.uint8)
    batch = ReadBatch(names=names, codes=codes,
                      lengths=np.full(40, 100, np.int32),
                      quals=np.full((40, 100), ord("I"), np.uint8),
                      ambig=np.zeros((40, 100), bool))
    fq = tmp_path / "j.fq"
    write_fastq(str(fq), batch)
    cfg = subjunc_config(batch_reads=256, pad_read_len=128)
    al = Aligner(g, chr901_index, cfg)
    out = tmp_path / "out.sam"
    al.align_file(str(fq), str(out))

    n_junc_weak = n_junc_disc = 0
    for line in open(out):
        if line.startswith("@"): continue
        fds = line.split("\t")
        if "N" in fds[5]:
            if fds[0].startswith("weak"): n_junc_weak += 1
            else: n_junc_disc += 1
    assert n_junc_disc >= 15, n_junc_disc
    # without event sharing the weak reads can't get junction CIGARs
    assert n_junc_weak >= 15, n_junc_weak
    bed = (tmp_path / "out.sam.junction.bed").read_text().splitlines()
    juncs = [l for l in bed if not l.startswith("#")]
    assert juncs
    sup = max(int(l.split("\t")[4]) for l in juncs)
    assert sup >= 30, sup  # support includes the rescued reads


def test_second_junction_chaining(tmp_path, chr901_genome, chr901_index):
    """Multi-junction CIGARs: a read crossing two junctions whose first
    exon chunk is too short to vote gets a second N op chained from the
    event table (reference explain_read emits e.g. 8M98N74M168N19M)."""
    import numpy as np

    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import subjunc_config
    g = chr901_genome
    base = 300_000 + g.padding
    # exons: [base, base+9], [base+110, base+189], [base+290, base+309]
    # with GT..AG donors planted at both introns
    codes = np.asarray(g.codes).copy()
    GT = [1, 3]; AG = [0, 1]
    codes[base + 10 : base + 12] = GT
    codes[base + 108 : base + 110] = AG
    codes[base + 190 : base + 192] = GT
    codes[base + 288 : base + 290] = AG
    import dataclasses

    g2 = dataclasses.replace(g, codes=codes)
    from subread_tpu.index.build import build_hash_index

    idx = build_hash_index(g2, index_gap=1)
    ex1 = codes[base : base + 10]
    ex2 = codes[base + 110 : base + 190]
    ex3 = codes[base + 290 : base + 310]
    read = np.concatenate([ex1, ex2, ex3])  # 10 + 80 + 20 = 110bp
    # plus companion reads that discover the junctions with long halves
    r_j1 = codes[base - 40 + 10 : base + 10]  # 50/50 around intron 1
    r_j1 = np.concatenate([codes[base - 40 : base + 10], ex2[:50]])
    r_j2 = np.concatenate([ex2[30:], ex3, codes[base + 310 : base + 340]])
    names = ["multi"] + [f"d1_{i}" for i in range(3)] + [f"d2_{i}" for i in range(3)]
    seqs = [read] + [r_j1] * 3 + [r_j2] * 3
    recs = [
        (n, "".join("AGCT"[c] for c in s), "I" * len(s))
        for n, s in zip(names, seqs)
    ]
    fq = tmp_path / "multi.fq"
    with open(fq, "w") as f:
        for n, s, q in recs:
            f.write(f"@{n}\n{s}\n+\n{q}\n")
    al = Aligner(g2, idx, subjunc_config(batch_reads=256, pad_read_len=128))
    out = tmp_path / "out.sam"
    al.align_file(str(fq), str(out))
    got = {}
    for line in open(out):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        got[f[0]] = (int(f[3]), f[5])
    pos, cig = got["multi"]
    assert cig.count("N") == 2, f"expected chained CIGAR, got {cig}"
    assert cig == "10M100N80M100N20M", cig
    assert pos == base - g.padding + 1
