"""Read simulator — the genRandomReads equivalent (reference
gen_rand_reads.c, SURVEY.md §2 #28) plus the truth-in-read-name encoding
used by the reference test suite: names look like
``{chro}_{pos1}_{pos2}_...`` and the checker
(test/subread-align/readname_ora_match.py) accepts a mapping within
1200bp of either encoded position.
"""

from __future__ import annotations

import numpy as np

from .. import dna
from ..index.genome import Genome
from ..io.fastq import ReadBatch, batch_from_records


def simulate_reads(
    genome: Genome,
    n_reads: int,
    read_len: int = 100,
    *,
    rng: np.random.Generator | None = None,
    error_rate: float = 0.0,
    indel_rate: float = 0.0,
    max_indel: int = 5,
    paired: bool = False,
    fragment_range: tuple[int, int] = (150, 500),
    qual_char: str = "h",
) -> tuple[ReadBatch, ReadBatch | None]:
    """Simulate reads with truth encoded in the read names.

    Returns (R1, R2); R2 is None unless paired.  Substitution errors flip a
    base uniformly; an indel event inserts or deletes up to max_indel bases
    at a random interior point (read keeps fixed length by re-reading from
    the genome).
    """
    rng = rng or np.random.default_rng(0)
    names: list[str] = []
    r1_seqs: list[bytes] = []
    r2_seqs: list[bytes] = []

    contig_idx = rng.integers(0, len(genome.names), size=n_reads)
    frag_lens = (
        rng.integers(fragment_range[0], fragment_range[1] + 1, size=n_reads)
        if paired
        else np.full(n_reads, read_len)
    )
    frag_lens = np.maximum(frag_lens, read_len)

    for i in range(n_reads):
        c = int(contig_idx[i])
        clen = int(genome.lengths[c])
        flen = int(frag_lens[i])
        if clen < flen + 2 * max_indel + 2:
            flen = min(flen, clen - 1)
        pos = int(rng.integers(0, max(clen - flen - max_indel - 1, 1)))
        lin = genome.chro_to_linear(c, pos)

        span = genome.codes[lin : lin + flen + max_indel]
        cigar1 = f"{read_len}M"
        if indel_rate > 0 and rng.random() < indel_rate:
            ilen = int(rng.integers(1, max_indel + 1))
            cut = int(rng.integers(20, read_len - 20))
            if rng.random() < 0.5:  # deletion of ilen genome bases after cut
                span = np.concatenate([span[:cut], span[cut + ilen :]])
                cigar1 = f"{cut}M{ilen}D{read_len - cut}M"
            else:  # insertion of ilen random bases
                ins = rng.integers(0, 4, size=ilen).astype(np.uint8)
                span = np.concatenate([span[:cut], ins, span[cut:]])
                cigar1 = f"{cut}M{ilen}I{read_len - cut - ilen}M"

        r1 = span[:read_len].copy()
        if error_rate > 0:
            err = rng.random(read_len) < error_rate
            r1[err] = (r1[err] + rng.integers(1, 4, size=err.sum())) % 4

        pos2 = pos + flen - read_len
        name = f"{genome.names[c]}_{pos + 1}_{pos2 + 1}_{cigar1}_sim{i}"
        names.append(name)
        r1_seqs.append(dna.decode(r1).encode())
        if paired:
            # mate = reverse strand read at the far end of the fragment
            r2 = span[flen - read_len : flen].copy()
            if error_rate > 0:
                err = rng.random(read_len) < error_rate
                r2[err] = (r2[err] + rng.integers(1, 4, size=err.sum())) % 4
            r2_seqs.append(dna.decode(dna.revcomp(r2)).encode())

    qual = (qual_char * read_len).encode()
    quals = [qual[: len(s)] for s in r1_seqs]
    b1 = batch_from_records(names, r1_seqs, quals, pad_to=read_len)
    b2 = None
    if paired:
        b2 = batch_from_records(names, r2_seqs, [qual[: len(s)] for s in r2_seqs], pad_to=read_len)
    return b1, b2


def write_fastq(path: str, batch: ReadBatch, suffix: str = "") -> None:
    with open(path, "w") as f:
        for i, name in enumerate(batch.names):
            L = int(batch.lengths[i])
            seq = dna.decode(batch.codes[i, :L])
            q = batch.quals[i, :L].tobytes().decode()
            f.write(f"@{name}{suffix}\n{seq}\n+\n{q}\n")
