"""Multi-host execution: locus sharding + collective GTF merge.

The reference's cross-stage communication is the filesystem and its only
merge point is a single in-process sort of GTF records
(py/freddie_isoforms.py:281-287). Scaled out, the same structure becomes:

- every host runs the same pipeline over the shard of loci whose
  (contig, tint_id) hash lands on it (the BAM and reads are readable by
  every host; each host only processes/writes its shard);
- the final GTF is merged by all-gathering fixed-width record tensors
  across hosts (lengths first, then padded payloads) and sorting on every
  host, so each host can write an identical GTF (host 0's copy is the
  canonical output).

`initialize()` wraps jax.distributed.initialize; on a single process all
collectives degenerate to the identity, so the same code path runs
everywhere (tests emulate multi-host by running shards sequentially and
merging with the same merge function).
"""

from __future__ import annotations

import hashlib
import os


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when a multi-process setup is requested;
    returns (process_index, process_count)."""
    import jax

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def owns_tint(contig: str, tint_id: int, process_index: int, process_count: int) -> bool:
    """Deterministic round-robin-by-hash locus assignment (stable across
    runs and platforms; not Python's salted hash)."""
    if process_count <= 1:
        return True
    digest = hashlib.blake2b(
        f"{contig}:{tint_id}".encode(), digest_size=8
    ).digest()
    return int.from_bytes(digest, "little") % process_count == process_index


def merge_gtf_records(local_records: list[tuple[tuple, str]]) -> list[tuple[tuple, str]]:
    """All-gather per-host GTF records and return the globally sorted list
    (identical on every host). Single-process: just sorts."""
    import jax

    if jax.process_count() <= 1:
        return sorted(local_records)

    import numpy as np
    from jax.experimental import multihost_utils

    # Serialize records; keys are re-derived after transport from the text
    # (chrom = first field, start0 = transcript start-1).
    blobs = [text for _key, text in local_records]
    payload = "\x00".join(blobs).encode()
    n = np.array([len(payload)], dtype=np.int64)
    max_n = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros(max_n, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    lens = multihost_utils.process_allgather(n)  # (P, 1)
    bufs = multihost_utils.process_allgather(buf)  # (P, max_n)
    merged: list[tuple[tuple, str]] = []
    for i in range(bufs.shape[0]):
        raw = bytes(bufs[i, : int(lens[i])].tobytes()).decode()
        if not raw:
            continue
        for text in raw.split("\x00"):
            first = text.split("\n")[0].split("\t")
            merged.append(((first[0], int(first[3]) - 1), text))
    return sorted(merged)


def run_pipeline_distributed(
    bam: str,
    reads: list[str],
    outdir: str,
    cfg=None,
    process_index: int | None = None,
    process_count: int | None = None,
    log=print,
) -> list[tuple[tuple, str]]:
    """Multi-host pipeline: every process ingests the (replicated) BAM and
    runs split identically -- deterministic, so the shared per-tint TSVs
    agree byte-for-byte regardless of which host wrote them (on a shared
    filesystem, per-tint resume makes the writes idempotent; on host-local
    disks each host simply keeps the full split). Segment and cluster then
    process only owned loci, and the isoforms stage all-gathers the GTF
    records (py/freddie_isoforms.py:281's single sort, reproduced
    collectively). Returns the merged records; process 0 writes the GTF.
    """
    import jax

    from ..config import PipelineConfig
    from ..stages.cluster import run_cluster
    from ..stages.segment import run_segment
    from ..stages.split import run_split

    cfg = cfg or PipelineConfig()
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    split_dir = os.path.join(outdir, "split")
    segment_dir = os.path.join(outdir, "segment")
    cluster_dir = os.path.join(outdir, "cluster")
    gtf = os.path.join(outdir, "isoforms.gtf")

    def owns(contig, tint_id):
        return owns_tint(contig, tint_id, pi, pc)

    # Split runs once (process 0) on a shared filesystem; the collective
    # below doubles as the barrier. With host-local disks every process
    # runs it (deterministic, identical outputs).
    if not os.path.isdir(split_dir) and pi == 0:
        run_split(bam, reads, split_dir, cfg.split)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("freddie-split-done")
    log(f"[dist p{pi}/{pc}] split ready")
    run_segment(split_dir, segment_dir, cfg.segment, owns=owns)
    log(f"[dist p{pi}/{pc}] segment shard done")
    run_cluster(segment_dir, cluster_dir, cfg.cluster, owns=owns)
    log(f"[dist p{pi}/{pc}] cluster shard done")
    return run_isoforms_distributed(
        split_dir, cluster_dir, gtf, cfg.isoforms,
        process_index=pi, process_count=pc,
    )


def run_isoforms_distributed(
    split_dir: str,
    cluster_dir: str,
    output: str,
    cfg=None,
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[tuple[tuple, str]]:
    """Shard-aware isoforms stage: consensus on owned tints only, then a
    collective merge; every process returns the merged records and process
    0 (or a single process) writes the GTF."""
    import jax

    from ..config import IsoformsConfig
    from ..stages.isoforms import tint_isoforms

    cfg = cfg or IsoformsConfig()
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    local: list[tuple[tuple, str]] = []
    for contig in sorted(os.listdir(cluster_dir)):
        cdir = os.path.join(cluster_dir, contig)
        if not os.path.isdir(cdir):
            continue
        for fn in sorted(os.listdir(cdir)):
            if not (fn.startswith("cluster_") and fn.endswith(".tsv")):
                continue
            tint_id = int(fn[:-4].split("_")[-1])
            if not owns_tint(contig, tint_id, pi, pc):
                continue
            split_tsv = os.path.join(split_dir, contig, f"split_{contig}_{tint_id}.tsv")
            local.extend(tint_isoforms(os.path.join(cdir, fn), split_tsv, cfg))

    merged = merge_gtf_records(local)
    if pi == 0:
        with open(output, "w") as f:
            for _key, text in merged:
                f.write(text)
                f.write("\n")
    return merged
