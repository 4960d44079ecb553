"""Multi-sample workflow runner -- the reference's Snakemake equivalent.

The reference orchestrates minimap2 -> split -> segment -> cluster ->
isoforms per sample via a Snakefile + config.yaml (Snakefile:22-121,
config.yaml:1-24). Here the same orchestration is a config-driven runner
with the same checkpoint semantics (a stage whose output directory exists
is skipped on resume). Alignment remains external, as in the reference
(bring a sorted BAM per sample; the minimap2 rule is a shell step there
too).

Config schema (YAML):

    outpath: out/
    samples:
      S1:
        bam: path/to/S1.sorted.bam      # either a pre-aligned BAM ...
        reads: [path/to/S1.fastq]
      S2:
        genome: path/to/genome.fa       # ... or a genome: the workflow
        reads: [path/to/S2.fastq]       # runs minimap2 -a -x splice and
                                        # sorts with the own BAM codec
                                        # (io/align.py; Snakefile:30-47)
    stages:            # optional per-stage parameter overrides
      segment: {sigma: 5.0}
      cluster: {timeout: 1.0}

Dotted-path overrides (the reference's override_* mechanism,
Snakefile:3-9) are supported programmatically via `apply_overrides`.
"""

from __future__ import annotations

import os
from typing import Any

from ..config import PipelineConfig
from .pipeline import run_pipeline


def apply_overrides(raw: dict, overrides: dict[str, Any]) -> dict:
    """Apply {'a.b.c': value} overrides into a nested dict; every path must
    already exist (matching the reference's assert at Snakefile:8)."""
    for path, value in overrides.items():
        keys = path.split(".")
        node = raw
        for i, k in enumerate(keys[:-1]):
            # Intermediate sections may be legitimately absent (e.g. an
            # unset `stages.segment`); create them so any stage parameter
            # can be overridden from the command line.
            if k not in node or node[k] is None:
                node[k] = {}
            node = node[k]
        node[keys[-1]] = value
    return raw


def load_workflow_config(path: str, overrides: dict[str, Any] | None = None) -> dict:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if overrides:
        apply_overrides(raw, overrides)
    return raw


def run_workflow(config: dict, resume: bool = True, log=print) -> dict:
    outpath = config["outpath"].rstrip("/")
    stage_cfg = config.get("stages", {}) or {}
    pcfg = PipelineConfig(
        **{
            name: cls(**(stage_cfg.get(name, {}) or {}))
            for name, cls in (
                ("split", PipelineConfig().split.__class__),
                ("segment", PipelineConfig().segment.__class__),
                ("cluster", PipelineConfig().cluster.__class__),
                ("isoforms", PipelineConfig().isoforms.__class__),
            )
        }
    )
    results = {}
    for sample, spec in config["samples"].items():
        sample_out = os.path.join(outpath, "results", sample)
        log(f"[workflow] sample {sample} -> {sample_out}")
        bam = spec.get("bam")
        if bam is None:
            # Alignment step (the reference's minimap2 rule,
            # Snakefile:30-47): a sample may give `genome` + `reads`
            # instead of a pre-aligned `bam`. Resume-skipped when the
            # sorted BAM already exists, like every other stage.
            from ..io.align import align_reads

            genome = spec.get("genome")
            assert genome, f"sample {sample}: provide either 'bam' or 'genome'"
            bam = os.path.join(sample_out, f"{sample}.sorted.bam")
            if not (resume and os.path.exists(bam)):
                os.makedirs(sample_out, exist_ok=True)
                n = align_reads(
                    genome, list(spec["reads"]), bam,
                    threads=int(spec.get("threads", 4)),
                )
                log(f"[workflow] aligned {sample}: {n} records -> {bam}")
        stats = run_pipeline(
            bam, list(spec["reads"]), sample_out, pcfg, resume=resume, log=log
        )
        results[sample] = stats
    return results
