#!/usr/bin/env python3
"""Warm the persistent JAX compile cache for the production DP kernel
shapes, one subprocess per shape.

Through the axon remote-compile tunnel a process reliably wedges after
one or two fresh Mosaic compiles (indefinite socket wait, no error), so
compiling N shapes in one process -- what the segment stage does on a
cold cache -- stalls. One short-lived process per shape sidesteps that:
each claims the chip, compiles exactly one shape into .jax_cache, and
exits; already-cached shapes are a few-second no-op. Run this before
bench.py after any kernel-source change.

Usage: python tools/warm_kernels.py [B,P,R[,wide] ...]
  (default: the segment-stage buckets + the bench microbench shape)

NEVER run while another process holds the chip (single-claim).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SHAPES = [
    (2048, 64, 512, 0),  # bench.py kernel microbench (raw kernel path)
]

# Production segment-stage dispatch shapes (the composed jit: int16
# coverage cast + Pallas kernel + on-device chain walk). These are the
# bucket/chunk shapes the streaming driver emits on the bench dataset;
# warming goes through ops.segdp.dispatch_batch_device so the exact
# production executable lands in the cache.
DEFAULT_PROD_SHAPES = [
    # R=384: the bucket the bench dataset's ~270-rep tints land in
    # after the round-4 finer R edges (128/256/384/512/768/1024/1536).
    (512, 16, 384, 0),
    (64, 32, 384, 0),
    (64, 64, 384, 0),
    (512, 16, 128, 0),
    # legacy/large-tint buckets still reachable on other corpora
    (512, 16, 512, 0),
    (64, 32, 512, 0),
    (64, 64, 512, 0),
    # int32-coverage variants (coverage > 32,767 bases ships as int32;
    # a distinct executable that must be warmed too).
    (512, 16, 384, 1),
    (64, 32, 384, 1),
    (64, 64, 384, 1),
]

# (padded_rows, window_len) buckets of the polyA scan: the full shape
# set is {1024, 8192} x {64, 256} (ops.polya_batch caps device windows
# at 256 chars and chunks rows at 8192 -- XLA:TPU scan executables grow
# steeply with both dims).
DEFAULT_POLYA_SHAPES = [
    (8192, 64),
    (8192, 256),
    (1024, 64),
    (1024, 256),
]

CHILD = r"""
import os, sys, time
sys.path.insert(0, @REPO@)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(@REPO@, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import threading
# Watchdog THREAD, not SIGALRM: the deepest claim wedge blocks the main
# thread in a C socket wait where signals never get delivered.
def _claim_wedged():
    sys.stderr.write("claim wedged\n"); sys.stderr.flush(); os._exit(3)
_t = threading.Timer(float(os.environ.get("FREDDIE_CLAIM_PROBE_S", "240")), _claim_wedged)
_t.daemon = True
_t.start()
_ = np.asarray(jnp.zeros((8, 8)).sum())
_t.cancel()
from freddie_tpu.ops.segdp_pallas import solve_batch_pallas
from freddie_tpu.ops.thresholds import ScaledThresholds

B, P, R, wide = @SHAPE@
thr = ScaledThresholds(0.9)
C = jnp.zeros((B, P, R), jnp.int32)
y = jnp.tile(jnp.arange(P, dtype=jnp.int32)[None] * 100, (B, 1))
W = jnp.ones((B, R), jnp.float32)
n = jnp.full((B,), P, jnp.int32)
fn = jax.jit(solve_batch_pallas,
             static_argnames=("read_support", "scale", "wide_weights"))
t0 = time.perf_counter()
out = fn(C, y, W, n, read_support=3, lookup=jnp.asarray(thr.lookup),
         scale=thr.scale, wide_weights=bool(wide))
_ = np.asarray(out[1][:1])
print(f"warm B={B} P={P} R={R} wide={wide}: {time.perf_counter() - t0:.0f}s",
      flush=True)
"""

PROD_CHILD = r"""
import os, sys, time
sys.path.insert(0, @REPO@)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(@REPO@, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import threading
def _claim_wedged():
    sys.stderr.write("claim wedged\n"); sys.stderr.flush(); os._exit(3)
_t = threading.Timer(float(os.environ.get("FREDDIE_CLAIM_PROBE_S", "240")), _claim_wedged)
_t.daemon = True
_t.start()
_ = np.asarray(jnp.zeros((8, 8)).sum())
_t.cancel()
from freddie_tpu.ops.segdp import DPProblem, collect_batch_device, dispatch_batch_device
from freddie_tpu.ops.thresholds import ScaledThresholds

B, P, R, wide_c = @SHAPE@
thr = ScaledThresholds(0.9)
rng = np.random.default_rng(0)
# wide_c=1 forces coverage values past int16, warming the int32-input
# executable variant (long reads can exceed 32,767 covered bases; the
# dispatcher ships int16 only when every value fits).
base = 40_000 if wide_c else 0
problems = [
    DPProblem(
        C=base + np.cumsum(rng.integers(0, 3, (P, R)), axis=0).astype(np.int64),
        y=np.cumsum(rng.integers(100, 200, P)).astype(np.int64),
        W=np.ones(R, dtype=np.int64),
        read_support=3,
    )
    for _ in range(B)
]
t0 = time.perf_counter()
handles, work, res = dispatch_batch_device(problems, thr, pad_p_to=P, pad_r_to=R)
collect_batch_device(handles, work, res)
print(f"warm prod B={B} P={P} R={R} wide_c={wide_c}: {time.perf_counter() - t0:.0f}s",
      flush=True)
"""

POLYA_CHILD = r"""
import os, sys, time
sys.path.insert(0, @REPO@)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(@REPO@, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import threading
# Watchdog THREAD, not SIGALRM: the deepest claim wedge blocks the main
# thread in a C socket wait where signals never get delivered.
def _claim_wedged():
    sys.stderr.write("claim wedged\n"); sys.stderr.flush(); os._exit(3)
_t = threading.Timer(float(os.environ.get("FREDDIE_CLAIM_PROBE_S", "240")), _claim_wedged)
_t.daemon = True
_t.start()
_ = np.asarray(jnp.zeros((8, 8)).sum())
_t.cancel()
from freddie_tpu.ops.polya_batch import _get_scan

B, L = @SHAPE@
packed = jnp.zeros((B, L // 8), jnp.uint8)
lens = jnp.full((B,), L, jnp.int32)
t0 = time.perf_counter()
out = _get_scan()(packed, lens)
_ = np.asarray(out[0][:1])
print(f"warm polyA B={B} L={L}: {time.perf_counter() - t0:.0f}s", flush=True)
"""


def main():
    jobs = []
    for arg in sys.argv[1:]:
        if arg.startswith("polya:"):
            b, l = arg[len("polya:"):].split(",")
            jobs.append((POLYA_CHILD, (int(b), int(l))))
            continue
        if arg.startswith("prod:"):
            parts = [int(x) for x in arg[len("prod:"):].split(",")]
            jobs.append((PROD_CHILD, tuple(parts + [0] * (4 - len(parts)))))
            continue
        parts = [int(x) for x in arg.split(",")]
        jobs.append((CHILD, tuple(parts + [0] * (4 - len(parts)))))
    if not jobs:
        jobs = [(PROD_CHILD, s) for s in DEFAULT_PROD_SHAPES]
        jobs += [(CHILD, s) for s in DEFAULT_SHAPES]
        jobs += [(POLYA_CHILD, s) for s in DEFAULT_POLYA_SHAPES]
    timeout_s = float(os.environ.get("FREDDIE_WARM_TIMEOUT_S", "900"))
    for template, shape in jobs:
        for attempt in range(3):
            try:
                code = template.replace("@REPO@", repr(REPO)).replace(
                    "@SHAPE@", repr(shape))
                proc = subprocess.run(
                    [sys.executable, "-c", code],
                    timeout=timeout_s, capture_output=True, text=True,
                )
            except subprocess.TimeoutExpired:
                print(f"warm {shape}: attempt {attempt + 1} timed out; "
                      "waiting for the chip claim to release", flush=True)
                time.sleep(150)
                continue
            sys.stdout.write(proc.stdout)
            if proc.returncode == 0:
                time.sleep(20)  # let the released claim settle
                break
            print(f"warm {shape}: attempt {attempt + 1} rc={proc.returncode}\n"
                  + proc.stderr[-1500:], flush=True)
            time.sleep(150)
        else:
            print(f"warm {shape}: FAILED after 3 attempts", flush=True)


if __name__ == "__main__":
    main()
