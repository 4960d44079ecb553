"""Device-mesh parallelism: loci sharding and result merging.

The reference's only parallelism is a process pool over independent tints
(SURVEY.md section 2.2). Here the same independence becomes data
parallelism over a 1-D `loci` mesh axis: padded DP problem batches are
sharded over devices, each device solves its shard with the batched XLA
kernel, and small per-locus results (backpointers, choices, stats) are
gathered back. Multi-host runs shard by (contig, tint) hash and merge GTF
records with an all-gather, replicating the reference's single final sort
(py/freddie_isoforms.py:281)."""

from .mesh import loci_mesh, solve_batch_sharded  # noqa: F401
