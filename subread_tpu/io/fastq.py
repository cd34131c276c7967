"""FASTQ reading into dense batches.

Reference equivalent: the FASTQ arm of `gene_input_t`
(`geinput_next_read`, input-files.c:768) plus quality-format detection
(`guess_reads_density_format`, input-files.h:283).

TPU-first design: instead of a per-read streaming API, reads are parsed into
fixed-shape dense batches (codes [N, Lmax] uint8, lengths, quals) that upload
straight to HBM.  Chunk replay (the reference's geinput_tell/seek, used to
re-scan each chunk once per index block and once for realignment) becomes
simply keeping the parsed chunk in host RAM.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field

import numpy as np

from .. import dna


@dataclass
class ReadBatch:
    """A dense batch of reads. codes are A=0,G=1,C=2,T=3; pad value 0."""

    names: list[str]
    codes: np.ndarray   # uint8 [n, max_len]
    lengths: np.ndarray  # int32 [n]
    quals: np.ndarray   # uint8 [n, max_len] raw ASCII phred bytes (0 = pad)
    ambig: np.ndarray   # bool [n, max_len]; True at N / non-ACGT

    def __len__(self) -> int:
        return len(self.names)

    @property
    def max_len(self) -> int:
        return self.codes.shape[1]


def _open_maybe_gz(path: str):
    f = open(path, "rb")
    if f.peek(2)[:2] == b"\x1f\x8b":
        f.close()
        return gzip.open(path, "rb")
    return f


def batch_from_records(
    names: list[str], seqs: list[bytes], quals: list[bytes], pad_to: int | None = None
) -> ReadBatch:
    n = len(names)
    lens = np.fromiter((len(s) for s in seqs), dtype=np.int32, count=n)
    max_len = int(lens.max()) if n else 0
    if pad_to is not None:
        max_len = max(max_len, pad_to)
    codes = np.zeros((n, max_len), dtype=np.uint8)
    qarr = np.zeros((n, max_len), dtype=np.uint8)
    amb = np.zeros((n, max_len), dtype=bool)
    # Vectorised fill: concatenate all bytes once, LUT-encode, then scatter.
    if n:
        flat = np.frombuffer(b"".join(seqs), dtype=np.uint8)
        enc = dna.BASE2CODE[flat]
        ambf = dna.AMBIG[flat]
        qflat = np.frombuffer(b"".join(quals), dtype=np.uint8)
        ends = np.cumsum(lens)
        starts = ends - lens
        # row/col index for each flat element
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(flat)) - np.repeat(starts, lens)
        codes[rows, cols] = enc
        amb[rows, cols] = ambf
        qarr[rows, cols] = qflat
    return ReadBatch(names=names, codes=codes, lengths=lens, quals=qarr, ambig=amb)


class FastqReader:
    """Chunked FASTQ reader (plain or gzip)."""

    def __init__(self, path: str):
        self.path = path
        self._f = _open_maybe_gz(path)

    def next_batch(self, max_reads: int, pad_to: int | None = None) -> ReadBatch | None:
        names: list[str] = []
        seqs: list[bytes] = []
        quals: list[bytes] = []
        f = self._f
        for _ in range(max_reads):
            hdr = f.readline()
            if not hdr:
                break
            seq = f.readline().strip()
            f.readline()  # '+'
            qual = f.readline().strip()
            names.append(hdr[1:].split()[0].decode())
            seqs.append(seq)
            quals.append(qual)
        if not names:
            return None
        return batch_from_records(names, seqs, quals, pad_to=pad_to)

    def close(self):
        self._f.close()


def read_fastq(path: str, pad_to: int | None = None) -> ReadBatch:
    r = FastqReader(path)
    try:
        batches = []
        while True:
            b = r.next_batch(1 << 20, pad_to=pad_to)
            if b is None:
                break
            batches.append(b)
    finally:
        r.close()
    if len(batches) == 1:
        return batches[0]
    if not batches:
        return batch_from_records([], [], [])
    maxlen = max(b.max_len for b in batches)

    def padto(a, fill=0):
        out = np.full((a.shape[0], maxlen), fill, dtype=a.dtype)
        out[:, : a.shape[1]] = a
        return out

    return ReadBatch(
        names=[n for b in batches for n in b.names],
        codes=np.concatenate([padto(b.codes) for b in batches]),
        lengths=np.concatenate([b.lengths for b in batches]),
        quals=np.concatenate([padto(b.quals) for b in batches]),
        ambig=np.concatenate([padto(b.ambig) for b in batches]),
    )


def guess_phred_offset(quals: np.ndarray, lengths: np.ndarray) -> int:
    """Guess 33 vs 64 phred offset from a sample of quality bytes.

    Mirrors the intent of the reference's quality-format auto-detection:
    bytes below '@' (64) can only be phred+33; an all->='@' sample with
    high minimum is phred+64.
    """
    n = min(len(lengths), 2048)
    if n == 0:
        return 33
    sample = quals[:n]
    mask = np.arange(sample.shape[1])[None, :] < lengths[:n, None]
    vals = sample[mask]
    if len(vals) == 0:
        return 33
    return 64 if int(vals.min()) >= 64 else 33
