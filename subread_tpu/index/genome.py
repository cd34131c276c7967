"""Linear genome: contigs concatenated with padding, 2-bit packed.

Coordinate convention mirrors the reference index builder
(index-builder.c:114-134, 179-213): each contig is surrounded by
`padding` (=1210, MAX_READ_LENGTH) filler bases, i.e. the linear layout is

    [pad] contig0 [pad] [pad] contig1 [pad] ... contigK [pad]

so contig c starts at linear position ``starts[c]`` with
``starts[0] = padding`` and ``starts[c] = ends[c-1] + padding`` where
``ends[c] = starts[c] + len_c + padding`` is the value recorded in the
`.reads` file (reference writes "<end>\t<name>" per contig,
index-builder.c:189-194; loaded by load_offsets, gene-algorithms.c:1293).

Padding bases are 'A' (code 0); genuinely-N genome bases are stored as
code 3 ('T'-code, matching base2int('N')) but tracked in an ambiguity
bitmap so the 16-mer scan can skip windows containing them (the
reference's `skips` counter, index-builder.c:229-234).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import dna
from ..io.fasta import Contig, read_fasta

PADDING = 1210  # MAX_READ_LENGTH, reference subread.h:73


@dataclass
class Genome:
    names: list[str]
    starts: np.ndarray   # int64 [K] linear start of each contig
    lengths: np.ndarray  # int64 [K]
    ends: np.ndarray     # int64 [K] = starts + lengths + padding (.reads value)
    codes: np.ndarray    # uint8 [total] linear per-base codes (incl. padding)
    ambig: np.ndarray    # packed uint8 bitmap [ceil(total/8)] of N positions
    padding: int = PADDING

    @property
    def total(self) -> int:
        return len(self.codes)

    # --- coordinate translation -------------------------------------------

    def linear_to_chro(self, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Linear positions → (contig_idx, 0-based offset in contig).

        Reference: locate_gene_position (gene-algorithms.c:514).  Positions
        inside padding resolve to the following contig with a negative or
        overflowing offset; callers clamp/filter.
        """
        pos = np.asarray(pos, dtype=np.int64)
        idx = np.searchsorted(self.ends, pos, side="right")
        idx = np.clip(idx, 0, len(self.names) - 1)
        return idx, pos - self.starts[idx]

    def chro_to_linear(self, contig_idx: int, offset: int) -> int:
        """(contig, 0-based offset) → linear position (linear_gene_position,
        gene-algorithms.c:419)."""
        return int(self.starts[contig_idx]) + int(offset)

    # --- base access ------------------------------------------------------

    def get_ambig(self, lo: int, hi: int) -> np.ndarray:
        """Unpack the N bitmap over [lo, hi)."""
        bits = np.unpackbits(self.ambig, bitorder="little")
        return bits[lo:hi].astype(bool)

    def packed_u32(self) -> np.ndarray:
        """2-bit packed genome as little-endian uint32 words for the device."""
        return dna.packed_as_u32(dna.pack_2bit(self.codes))

    # --- persistence ------------------------------------------------------

    def save(self, prefix: str) -> None:
        np.savez_compressed(
            prefix + ".genome.npz",
            names=np.array(self.names),
            starts=self.starts,
            lengths=self.lengths,
            ends=self.ends,
            packed=dna.pack_2bit(self.codes),
            total=np.int64(self.total),
            ambig=self.ambig,
            padding=np.int64(self.padding),
        )
        # .reads interchange file (text, reference format)
        with open(prefix + ".reads", "w") as f:
            for e, n in zip(self.ends, self.names):
                f.write(f"{int(e)}\t{n}\n")

    @classmethod
    def load(cls, prefix: str) -> "Genome":
        z = np.load(prefix + ".genome.npz", allow_pickle=False)
        total = int(z["total"])
        return cls(
            names=[str(x) for x in z["names"]],
            starts=z["starts"],
            lengths=z["lengths"],
            ends=z["ends"],
            codes=dna.unpack_2bit(z["packed"], total),
            ambig=z["ambig"],
            padding=int(z["padding"]),
        )


def build_genome(contigs: list[Contig], padding: int = PADDING) -> Genome:
    """Reference coordinate convention exactly (index-builder.c:130-213):
    the 16-char window prefill does not advance the builder's offset, so
    every contig's recorded end lags by 16:

        starts[0]  = padding
        ends[c]    = starts[c] + len_c + padding - 16   (the .reads value)
        starts[c+1]= ends[c] + padding                  (offset += 2*padding)
        total      = ends[-1] + 16                      (.array length)
    """
    names, starts, lengths, ends = [], [], [], []
    pos = padding
    for c in contigs:
        names.append(c.name)
        starts.append(pos)
        lengths.append(len(c.codes))
        end = pos + len(c.codes) + padding - 16
        ends.append(end)
        pos = end + padding
    total = (ends[-1] + 16) if ends else padding

    codes = np.zeros(total, dtype=np.uint8)
    ambig_linear = np.zeros(total, dtype=bool)
    for c, s0 in zip(contigs, starts):
        codes[s0 : s0 + len(c.codes)] = c.codes
        ambig_linear[s0 : s0 + len(c.codes)] = c.ambig

    return Genome(
        names=names,
        starts=np.asarray(starts, dtype=np.int64),
        lengths=np.asarray(lengths, dtype=np.int64),
        ends=np.asarray(ends, dtype=np.int64),
        codes=codes,
        ambig=np.packbits(ambig_linear, bitorder="little"),
        padding=padding,
    )


def genome_from_fasta(path: str, padding: int = PADDING) -> Genome:
    return build_genome(read_fasta(path), padding=padding)
