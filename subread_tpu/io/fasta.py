"""FASTA reading (plain or gzip).

Reference equivalent: the FASTA arm of `gene_input_t` (input-files.c:455,
geinput_next_char) and the index builder's FASTA sanity pass
(`check_and_convert_FastA`, index-builder.c:789).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass

import numpy as np

from .. import dna


@dataclass
class Contig:
    name: str
    codes: np.ndarray  # uint8 codes, A=0,G=1,C=2,T=3 (N→3, ref-compatible)
    ambig: np.ndarray  # bool, True at non-ACGT input letters


def _open_maybe_gz(path: str) -> io.BufferedReader:
    f = open(path, "rb")
    magic = f.peek(2)[:2] if hasattr(f, "peek") else b""
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return f


def read_fasta(path: str) -> list[Contig]:
    """Parse a (possibly gzipped) FASTA file into contigs."""
    contigs: list[Contig] = []
    name = None
    chunks: list[bytes] = []

    def flush():
        if name is not None:
            seq = b"".join(chunks)
            contigs.append(
                Contig(
                    name=name,
                    codes=dna.encode_genome(seq),
                    ambig=dna.ambig_mask(seq),
                )
            )

    with _open_maybe_gz(path) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b">"):
                flush()
                # contig name = first whitespace-delimited token after '>'
                name = line[1:].split()[0].decode()
                chunks = []
            else:
                chunks.append(line)
        flush()
    return contigs
