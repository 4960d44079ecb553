"""freddie-tpu: a TPU-native isoform detection/discovery engine.

A brand-new implementation of the capabilities of vpc-ccg/freddie
(annotation-free transcriptomic isoform discovery from splice-aligned
Nanopore long reads), architected for TPU hardware:

- Host side: streaming BAM/FASTQ ingest (own BGZF/BAM codec; the reference
  delegates this to pysam/htslib), locus partitioning, wire formats.
- Device side: all compute-dense inner loops -- splice-signal smoothing,
  cumulative-coverage, the segmentation breakpoint DP, and the cluster
  objective -- run as batched XLA/Pallas kernels over thousands of loci,
  with integer-exact decision thresholds so results are bit-identical
  across CPU/TPU backends.
- The reference's Gurobi ILP (py/freddie_cluster.py:347-636) is replaced by
  a deterministic exact branch-and-bound solver (freddie_tpu.solver).

Pipeline stages (mirroring the reference's 4 CLI stages):
  split    -> independent transcriptional intervals ("tints") from BAM
  segment  -> canonical segmentation per tint + per-read 0/1/2 matrices
  cluster  -> exact read->isoform assignment
  isoforms -> consensus + boundary correction -> GTF
"""

__version__ = "0.1.0"

__all__ = ["run_pipeline", "PipelineConfig"]


def __getattr__(name):
    # Lazy convenience exports (keep bare `import freddie_tpu` light).
    if name == "run_pipeline":
        from .stages.pipeline import run_pipeline

        return run_pipeline
    if name == "PipelineConfig":
        from .config import PipelineConfig

        return PipelineConfig
    raise AttributeError(name)
