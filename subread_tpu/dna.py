"""Base encodings and 2-bit packing, numpy host-side.

Encoding follows the reference index interchange convention
(`base2int`, reference subread.h:238): A=0, G=1, C=2, T=3.  Any other
letter maps the same way the reference macro does (everything < 'G'
and != 'A' → 2, everything >= 'G' and != 'G' → 3; so N → 3).  Reads
additionally track an N/ambiguity mask so voting can skip probes that
contain N (the reference skips such 16-mers via its `skips` counter,
index-builder.c:229-234).

A nice property of this code: complement(c) == 3 - c.
"""

from __future__ import annotations

import numpy as np

A, G, C, T = 0, 1, 2, 3

# --- LUTs ------------------------------------------------------------------

# base2int-compatible LUT over all 256 byte values.
BASE2CODE = np.zeros(256, dtype=np.uint8)
for _b in range(256):
    _c = chr(_b).upper()
    if _c == "A":
        BASE2CODE[_b] = A
    elif _c == "G":
        BASE2CODE[_b] = G
    elif _c < "G":
        BASE2CODE[_b] = C
    else:
        BASE2CODE[_b] = T

CODE2BASE = np.frombuffer(b"AGCT", dtype=np.uint8)

# Genome-path LUT: the reference index builder's FASTA sanity pass rewrites
# every non-ACGT character (including N, '.', '-') to 'A'
# (check_and_convert_FastA, index-builder.c:789+).
GENOME2CODE = np.zeros(256, dtype=np.uint8)  # default 'A' = 0
for _b, _code in zip(b"AGCTagct", [0, 1, 2, 3, 0, 1, 2, 3]):
    GENOME2CODE[_b] = _code


# True at 'N'/'n' only: the reference skips ONLY literal N in its 16-mer
# scans (index-builder.c:229 `if (nch == 'N') skips = 16`); other junk
# letters (IUPAC codes etc.) map through base2int like normal bases.
AMBIG = np.zeros(256, dtype=bool)
AMBIG[ord("N")] = True
AMBIG[ord("n")] = True


def encode_genome(seq: bytes | str) -> np.ndarray:
    """Genome FASTA encoding: non-ACGT (incl. N) -> A, like the reference's
    index-builder FASTA rewrite."""
    if isinstance(seq, str):
        seq = seq.encode()
    raw = np.frombuffer(seq, dtype=np.uint8)
    return GENOME2CODE[raw]


def encode(seq: bytes | str) -> np.ndarray:
    """ASCII sequence → uint8 codes (A=0,G=1,C=2,T=3; N→3 like the ref)."""
    if isinstance(seq, str):
        seq = seq.encode()
    raw = np.frombuffer(seq, dtype=np.uint8)
    return BASE2CODE[raw]


def ambig_mask(seq: bytes | str) -> np.ndarray:
    """ASCII sequence → bool mask, True at non-ACGT letters (N etc.)."""
    if isinstance(seq, str):
        seq = seq.encode()
    raw = np.frombuffer(seq, dtype=np.uint8)
    return AMBIG[raw]


def decode(codes: np.ndarray) -> str:
    return CODE2BASE[np.asarray(codes, dtype=np.uint8) & 3].tobytes().decode()


def revcomp(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of a code array (complement = 3 - code)."""
    return (3 - codes[..., ::-1]).astype(codes.dtype)


# --- 2-bit packing ---------------------------------------------------------
# Layout matches the reference on-disk `.array` format (gene-value-index.c:43):
# base i occupies bits (i%4)*2 within byte i//4 — i.e. LSB-first.  Interpreting
# 4 consecutive bytes as a little-endian uint32 puts base i at bits (i%16)*2.


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """uint8 codes → packed uint8 array, 4 bases per byte, LSB-first."""
    n = len(codes)
    pad = (-n) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    quads = codes.reshape(-1, 4).astype(np.uint8)
    return (
        quads[:, 0] | (quads[:, 1] << 2) | (quads[:, 2] << 4) | (quads[:, 3] << 6)
    ).astype(np.uint8)


def unpack_2bit(packed: np.ndarray, n: int) -> np.ndarray:
    """Packed uint8 array → uint8 codes of length n."""
    b = np.asarray(packed, dtype=np.uint8)
    out = np.empty(len(b) * 4, dtype=np.uint8)
    out[0::4] = b & 3
    out[1::4] = (b >> 2) & 3
    out[2::4] = (b >> 4) & 3
    out[3::4] = (b >> 6) & 3
    return out[:n]


def packed_as_u32(packed: np.ndarray) -> np.ndarray:
    """Packed bytes → little-endian uint32 words (16 bases/word) for device."""
    b = np.asarray(packed, dtype=np.uint8)
    pad = (-len(b)) % 4
    if pad:
        b = np.concatenate([b, np.zeros(pad, dtype=np.uint8)])
    return b.view("<u4")


# --- 16-mer keys -----------------------------------------------------------
# Key packing is big-endian-first: base 0 at bits 30-31 (`genekey2int`,
# reference input-files.c:1232).

KMER = 16


def kmer_keys(codes: np.ndarray) -> np.ndarray:
    """All overlapping 16-mer keys of a code array.

    Returns uint32 array of length max(0, len(codes)-15); keys[i] is the
    big-endian-packed 16-mer starting at i.
    """
    n = len(codes)
    if n < KMER:
        return np.zeros(0, dtype=np.uint32)
    c = codes.astype(np.uint64) & 3
    # Horner over a rolling window via cumulative trick: compute with
    # convolution-free sliding: key[i] = sum_j c[i+j] << (2*(15-j)).
    out = np.zeros(n - KMER + 1, dtype=np.uint64)
    for j in range(KMER):
        out |= c[j : j + n - KMER + 1] << (2 * (KMER - 1 - j))
    return out.astype(np.uint32)


def window_has_ambig(ambig: np.ndarray, k: int = KMER) -> np.ndarray:
    """Sliding-window any() of an ambiguity mask: True where the k-window
    starting at i contains an ambiguous base."""
    n = len(ambig)
    if n < k:
        return np.zeros(0, dtype=bool)
    cs = np.concatenate([[0], np.cumsum(ambig.astype(np.int32))])
    return (cs[k:] - cs[:-k]) > 0
