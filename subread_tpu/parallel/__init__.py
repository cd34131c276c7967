"""Parallel layer: device meshes and sharded alignment steps.

The reference's only parallelism is single-node pthreads (SURVEY.md §1);
this layer maps those axes onto real hardware: data-parallel read batches
across chips (the thread-pool analog), replicated or sharded index
(the index-block serialization analog), with XLA collectives doing the
merges that the reference does at thread barriers.
"""

from .mesh import make_mesh, shard_batch, sharded_align_step

__all__ = ["make_mesh", "shard_batch", "sharded_align_step"]
