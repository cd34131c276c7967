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
