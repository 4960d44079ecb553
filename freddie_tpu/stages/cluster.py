"""Stage 3 -- cluster: exact read->isoform assignment per tint.

Reproduces the reference's clustering pipeline (py/freddie_cluster.py)
with the Gurobi ILP swapped for the deterministic exact solver:

  1. preprocess: I/C/FL matrices, polyA-tail promotion to virtual gaps,
     garbage costs (:277-328);
  2. partition: dedup identical structures, pairwise-compatibility graph,
     iterative edge pruning, connected components, even splitting at
     max_ilp (:196-274);
  3. per partition, up to max_rounds greedy rounds, each peeling off the
     single optimal isoform (K=2: garbage + one real) and removing its
     reads (:694-773);
  4. cluster TSV output (:639-691).

Tie-breaking note: ILP optima need not be unique and Gurobi's choice is
unspecified; this implementation fixes a deterministic rule (first optimum
in heaviest-garbage-first assign-first DFS order, strict improvement), so
outputs are bit-reproducible across runs and platforms.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from math import ceil

import numpy as np

from ..config import ClusterConfig
from ..io.tsv import SegTint, format_cluster_tsv, parse_segment_tsv
from ..solver.exact import ClusterInstance, ReadRow, SolveResult


def _solve(inst: ClusterInstance, deadline_s: float) -> SolveResult:
    """LP-assisted two-phase exact solve over the native C++ core (with
    Python fallback); result-identical to the plain search (see
    solver.two_phase)."""
    from ..solver.two_phase import solve_two_phase

    return solve_two_phase(inst, deadline_s)


@dataclass
class IlpData:
    """Per-tint solver inputs at read-rep granularity."""

    I: list[list[int]]  # noqa: E741 -- name matches the reference
    C: list[list[int]]
    FL: list[tuple[int, int]]
    garbage: list[float]
    gaps: list[dict]  # per rep: {(j1, j2): l} including virtual tail gaps


def first_last_covered(I_row: list[int]) -> tuple[int, int]:
    """First/last segment with value 1 (py/freddie_cluster.py:175-183;
    note the reference's defaults: (-1, M-1) when the row has no 1s)."""
    min_i, max_i = -1, len(I_row) - 1
    for j, v in enumerate(I_row):
        if v == 1:
            if min_i == -1:
                min_i = j
            max_i = j
    return min_i, max_i


def preprocess(tint: SegTint, cfg: ClusterConfig) -> IlpData:
    M = len(tint.segs)
    I, C, FL, garbage, gaps = [], [], [], [], []
    for rep_idx, ridxs in enumerate(tint.read_reps):
        read = tint.reads[ridxs[0]]
        I_row = [d % 2 for d in read.data]
        min_i, max_i = first_last_covered(I_row)
        category = "N"
        rep_gaps = dict(read.gaps)
        if len(read.poly_tail) == 1:
            tail_key, tail_val = next(iter(read.poly_tail.items()))
            if tail_key in ("SA", "ST") and tail_val[0] > 10:
                category = "S"
                rep_gaps[(-1, min_i)] = tail_val[1]
                min_i = 0
            elif tail_key in ("EA", "ET") and tail_val[0] > 10:
                category = "E"
                rep_gaps[(max_i, M)] = tail_val[1]
                max_i = M - 1
        C_row = [
            1 if (min_i <= j <= max_i and read.data[j] == 0) else 0 for j in range(M)
        ]
        if cfg.recycle_model == "constant":
            g = len(ridxs) * 3
        elif cfg.recycle_model == "exons":
            g = len(ridxs) * max(sum(I_row) - 0.5, 1)
        elif cfg.recycle_model == "introns":
            g = len(ridxs) * max(sum(C_row) - 0.5, 1)
        else:
            raise NotImplementedError(
                "recycle_model='relative' requires the K>2 objective; "
                "the reference pins K=2 (py/freddie_cluster.py:790)"
            )
        I.append(I_row)
        C.append(C_row)
        FL.append((min_i, max_i))
        garbage.append(g)
        gaps.append(rep_gaps)
        for ridx in ridxs:
            tint.reads[ridx].poly_tail_category = category
            tint.reads[ridx].gaps = rep_gaps
    return IlpData(I=I, C=C, FL=FL, garbage=garbage, gaps=gaps)


def split_list_evenly(l: list, m: int):
    p = ceil(len(l) / m)
    s = ceil(len(l) / p)
    for idx in range(0, p * s, s):
        yield l[idx : idx + s]


def partition_reads(
    tint: SegTint, ilp: IlpData, max_ilp: int
) -> list[tuple[list[int], list[tuple[int, int]]]]:
    """Partitions of rep ids + per-partition incompatible pairs
    (py/freddie_cluster.py:196-274)."""
    reads = tint.reads
    reps = tint.read_reps
    N_reps = len(reps)

    unique: dict[tuple, list[int]] = {}
    for i in range(N_reps):
        d = (
            tuple(ilp.I[i]),
            (ilp.FL[i][0], ilp.FL[i][1], reads[reps[i][0]].poly_tail_category),
        )
        unique.setdefault(d, []).append(i)
    unique_items = list(unique.items())
    N = len(unique_items)

    edges: list[tuple[int, int]] = []
    for i in range(N):
        d1, (f1, l1, t1) = unique_items[i][0]
        for j in range(i + 1, N):
            d2, (f2, l2, t2) = unique_items[j][0]
            if t1 != "N" and t2 != "N" and t1 != t2:
                continue
            f = max(f1, f2)
            l = min(l1, l2)
            o = l - f + 1
            w = sum(x == y == 1 for x, y in zip(d1[f : l + 1], d2[f : l + 1]))
            if w < 1:
                continue
            diff = sum(x != y for x, y in zip(d1[f : l + 1], d2[f : l + 1]))
            if (o > 3 and diff < 3) or (1 <= o <= 3 and diff == 0):
                edges.append((i, j))

    # Iterative pruning: drop an edge unless an endpoint has no other
    # neighbor or the pair shares a neighbor; sweep until stable.
    adj: list[set[int]] = [set() for _ in range(N)]
    edge_list = list(edges)
    alive = {e: True for e in edge_list}
    for i, j in edge_list:
        adj[i].add(j)
        adj[j].add(i)
    while True:
        to_remove = [
            (i, j)
            for (i, j) in edge_list
            if alive[(i, j)]
            and len(adj[i]) != 1
            and len(adj[j]) != 1
            and not (adj[i] & adj[j])
        ]
        if not to_remove:
            break
        for i, j in to_remove:
            alive[(i, j)] = False
            adj[i].discard(j)
            adj[j].discard(i)

    # Connected components (ordered by smallest member, like nx's iteration
    # over nodes 0..N-1).
    parent = list(range(N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i, j), ok in alive.items():
        if ok:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    comps: dict[int, list[int]] = {}
    for i in range(N):
        comps.setdefault(find(i), []).append(i)

    has_edge = {e for e, ok in alive.items() if ok}
    partitions = []
    for root in sorted(comps, key=lambda r: min(comps[r])):
        comp = sorted(comps[root])
        for c in split_list_evenly(comp, max_ilp):
            rids: list[int] = []
            incomp: list[tuple[int, int]] = []
            for idx, i in enumerate(c):
                rids.extend(unique_items[i][1])
                for j in c[idx + 1 :]:
                    a, b = min(i, j), max(i, j)
                    if (a, b) in has_edge:
                        continue
                    for r1 in unique_items[a][1]:
                        for r2 in unique_items[b][1]:
                            incomp.append((r1, r2))
            partitions.append((rids, incomp))
    return partitions


def informative_segs(tint: SegTint, ilp: IlpData, remaining: list[int]) -> list[bool]:
    """A middle segment is uninformative when its value is constant across
    the remaining reads and equals both neighbors
    (py/freddie_cluster.py:331-344)."""
    M = len(tint.segs)
    content = [set() for _ in range(M)]
    for j in range(M):
        for i in remaining:
            content[j].add(ilp.I[i][j])
            if len(content[j]) == 2:
                break
    informative = [True] * M
    for j in range(1, M - 1):
        if len(content[j]) == 1 and content[j - 1] == content[j] == content[j + 1]:
            informative[j] = False
    return informative


def build_instance(
    tint: SegTint,
    ilp: IlpData,
    remaining: list[int],
    incomp: list[tuple[int, int]],
    informative: list[bool],
    cfg: ClusterConfig,
) -> ClusterInstance:
    """Restrict the round's data to informative segments and package it for
    the solver."""
    M = len(tint.segs)
    inf_idx = [j for j in range(M) if informative[j]]
    col_of = {j: c for c, j in enumerate(inf_idx)}
    seg_len = np.array([tint.segs[j][2] for j in inf_idx], dtype=np.int64)
    Mi = len(inf_idx)
    rows = []
    for i in remaining:
        exons = np.zeros(Mi, dtype=bool)
        corrs = np.zeros(Mi, dtype=bool)
        for j in inf_idx:
            c = col_of[j]
            exons[c] = ilp.I[i][j] == 1
            corrs[c] = ilp.C[i][j] == 1
        row_gaps = []
        for (j1, j2), l in ilp.gaps[i].items():
            mask = np.zeros(Mi, dtype=bool)
            for j in range(j1 + 1, j2):
                if 0 <= j < M and informative[j]:
                    mask[col_of[j]] = True
            row_gaps.append((mask, l))
        rows.append(ReadRow(exons=exons, corr=corrs, garbage=ilp.garbage[i], gaps=row_gaps))
    rem_pos = {r: p for p, r in enumerate(remaining)}
    pair_set = set()
    pairs = []
    for a, b in incomp:
        if a in rem_pos and b in rem_pos:
            key = (rem_pos[a], rem_pos[b])
            if key not in pair_set:
                pair_set.add(key)
                pairs.append(key)
    return ClusterInstance(
        rows=rows,
        seg_len=seg_len,
        incomp=pairs,
        epsilon=cfg.epsilon,
        offset=cfg.gap_offset,
    )


def cluster_tint(
    tint: SegTint, cfg: ClusterConfig, instance_hook=None
) -> tuple[list[dict], list[int]]:
    """Full per-tint clustering; returns (isoforms, garbage_rep_ids) and
    fills read.partition / poly_tail_category. instance_hook(inst) is
    called for every solver instance (used by the optimum-uniqueness
    audit, tools/audit_tiebreak.py)."""
    import time as _time

    from ..utils.metrics import SolverLog

    ilp = preprocess(tint, cfg)
    partitions = partition_reads(tint, ilp, cfg.max_ilp)
    M = len(tint.segs)
    isoforms: list[dict] = []
    garbage_rids: list[int] = []
    slog = SolverLog(cfg.logs_dir, tint.id)

    for p_idx, (remaining, incomp) in enumerate(partitions):
        for rep_id in remaining:
            for ridx in tint.read_reps[rep_id]:
                tint.reads[ridx].partition = p_idx
        remaining = list(remaining)
        for _round in range(cfg.max_rounds):
            mult_left = sum(len(tint.read_reps[i]) for i in remaining)
            if mult_left < cfg.min_isoform_size:
                break
            informative = informative_segs(tint, ilp, remaining)
            inst = build_instance(tint, ilp, remaining, incomp, informative, cfg)
            if instance_hook is not None:
                instance_hook(inst)
            slog.dump_instance(p_idx, _round, inst)
            t0 = _time.perf_counter()
            res = _solve(inst, deadline_s=cfg.timeout * 60.0)
            slog.record(p_idx, _round, len(remaining), res, _time.perf_counter() - t0)
            if res.status != "OPTIMAL":
                break
            assigned_pos = set(res.assigned)
            assigned = [r for p, r in enumerate(remaining) if p in assigned_pos]
            assigned_mult = sum(len(tint.read_reps[i]) for i in assigned)
            if assigned_mult < cfg.min_isoform_size:
                break
            # Isoform exon bitstring: solver E on informative segments; the
            # (constant) read value elsewhere (py/freddie_cluster.py:602-610).
            inf_idx = [j for j in range(M) if informative[j]]
            col_of = {j: c for c, j in enumerate(inf_idx)}
            ref_row = ilp.I[min(remaining)]
            exons = [
                int(res.isoform[col_of[j]]) if informative[j] else ref_row[j]
                for j in range(M)
            ]
            rid_to_corrections = {}
            for rep_id in assigned:
                data = tint.reads[tint.read_reps[rep_id][0]].data
                corrections = [
                    "-"
                    if not informative[j]
                    else (
                        "X"
                        if ilp.C[rep_id][j] == 1 and exons[j] == 1
                        else str(data[j])
                    )
                    for j in range(M)
                ]
                rid_to_corrections[rep_id] = corrections
            isoforms.append(dict(exons=exons, rid_to_corrections=rid_to_corrections))
            assigned_set = set(assigned)
            remaining = [r for r in remaining if r not in assigned_set]
        garbage_rids.extend(sorted(remaining))
    slog.close()
    return isoforms, garbage_rids


def _cluster_one(job: tuple[str, str, str, "ClusterConfig"]) -> int:
    in_path, out_path, contig, cfg = job
    # Idempotent per-tint resume: outputs are deterministic, so an
    # existing file is a completed shard (SURVEY.md section 5 checkpoint
    # semantics; the pipeline driver removes stage dirs on forced reruns).
    if os.path.exists(out_path):
        return 1
    if cfg.logs_dir is not None:
        # Scope solver logs per contig (tint ids repeat across contigs),
        # like the reference's '{logs_dir}/{contig}' (py/freddie_cluster.py:813).
        import dataclasses

        cfg = dataclasses.replace(cfg, logs_dir=os.path.join(cfg.logs_dir, contig))
    tint = parse_segment_tsv(in_path)
    isoforms, garbage = cluster_tint(tint, cfg)
    with open(out_path, "w") as f:
        f.write(format_cluster_tsv(tint, isoforms, garbage))
    return 1


def run_cluster(segment_dir: str, outdir: str, cfg: ClusterConfig | None = None,
                owns=None) -> int:
    """Full cluster stage over a segment directory; returns #tints.

    ``owns(contig, tint_id) -> bool`` restricts to this process's shard.

    Tints are independent; with cfg.threads > 1 they run on a thread pool
    (the C++ branch-and-bound core releases the GIL for the duration of
    each solve, so threads scale the reference's process-pool parallelism
    without pickling)."""
    cfg = cfg or ClusterConfig()
    os.makedirs(outdir, exist_ok=True)
    jobs = []
    for contig in sorted(os.listdir(segment_dir)):
        cdir = os.path.join(segment_dir, contig)
        if not os.path.isdir(cdir):
            continue
        os.makedirs(os.path.join(outdir, contig), exist_ok=True)
        for fn in sorted(os.listdir(cdir)):
            if not (fn.startswith("segment_") and fn.endswith(".tsv")):
                continue
            tint_id = int(fn[:-4].split("_")[-1])
            if owns is not None and not owns(contig, tint_id):
                continue
            jobs.append(
                (
                    os.path.join(cdir, fn),
                    os.path.join(outdir, contig, f"cluster_{contig}_{tint_id}.tsv"),
                    contig,
                    cfg,
                )
            )
    if cfg.threads > 1 and len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=cfg.threads) as ex:
            return sum(ex.map(_cluster_one, jobs))
    return sum(_cluster_one(j) for j in jobs)
