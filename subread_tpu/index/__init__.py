"""Index layer: the linear 2-bit genome and the sorted 16-mer hash index.

Reference L2 equivalents (SURVEY.md §1/§2 #10-14): `gene_value_index_t`
(gene-value-index.c), `gehash_t` (sorted-hashtable.c), the `.reads`
chromosome-offset table (gene-algorithms.c:1293) and the index builder
(index-builder.c).  Here the whole index is a handful of flat numpy/JAX
arrays designed for direct host→HBM upload and vectorised binary search.
"""

from .genome import Genome
from .build import HashIndex, build_index

__all__ = ["Genome", "HashIndex", "build_index"]
