"""Pipeline stages: split -> segment -> cluster -> isoforms.

Each stage is a pure library function over in-memory locus data plus a thin
CLI/file driver reproducing the reference's directory-of-TSVs handoff
(SURVEY.md section 1), so any stage can be re-run from the previous stage's
outputs (the stage boundary is the checkpoint, as in the reference's
Snakemake DAG).
"""
