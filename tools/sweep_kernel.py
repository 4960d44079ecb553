#!/usr/bin/env python3
"""Sweep the DP Pallas kernel's static tuning knobs on the attached chip.

Usage: python tools/sweep_kernel.py [kb1:un1[:p1v1] kb2:un2[:p1v2] ...]
  (default sweep: 16:4 8:4 16:2 16:7 16:9 at B=2048, P=64, R=512)

kb = phase-1 K-block override (0 = the built-in heuristic);
un = phase-2 wavefront steps per loop iteration;
p1v = phase-1 variant (0 = bool-materializing; 1 = fused selects +
      MXU ones-dot row sums, Mosaic-blocked here; 2 = ones sublane
      appended by concat; 3 = bf16 operands, Mosaic-blocked here;
      4 = pre-padded scratch planes, the production default).

Each config is a distinct Mosaic compile. Through the axon tunnel a
process wedges after ~2 fresh remote compiles (see tools/warm_kernels.py),
so each config runs in its own subprocess: claim, compile (one-time via
the persistent .jax_cache), time min-of-3 with a small readback
(block_until_ready does not synchronize on this platform), verify the
backpointer outputs against the first config, exit. NEVER run while
another process holds the single-claim chip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B, P, R = 2048, 64, 512

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, @REPO@)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(@REPO@, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from freddie_tpu.ops.segdp_pallas import solve_batch_pallas
from freddie_tpu.ops.thresholds import ScaledThresholds

B, P, R, kb, un, p1v = @CFG@
thr = ScaledThresholds(0.9)
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)

@jax.jit
def gen():
    inc = jax.random.randint(k1, (B, P, R), 0, 12, dtype=jnp.int32)
    inc = jnp.where(jax.random.uniform(k2, (B, P, R)) < 0.5, 0, inc)
    C = jnp.cumsum(inc, axis=1).astype(jnp.int32)
    y = jnp.sort(jax.random.randint(k3, (B, P), 1, 20_000, dtype=jnp.int32), axis=1)
    y = y.at[:, 0].set(0)
    return C, y, jnp.ones((B, R), jnp.float32), jnp.full((B,), P, jnp.int32)

C, y, W, n = gen()
lookup = jnp.asarray(thr.lookup)
fn = jax.jit(solve_batch_pallas,
             static_argnames=("read_support", "scale", "wide_weights",
                              "kb_override", "un", "p1v"))
t0 = time.perf_counter()
out = fn(C, y, W, n, read_support=3, lookup=lookup, scale=thr.scale,
         wide_weights=False, kb_override=kb, un=un, p1v=p1v)
bj = np.asarray(out[1])
compile_s = time.perf_counter() - t0
times = []
for _ in range(3):
    t0 = time.perf_counter()
    out = fn(C, y, W, n, read_support=3, lookup=lookup, scale=thr.scale,
             wide_weights=False, kb_override=kb, un=un, p1v=p1v)
    _ = np.asarray(out[1])
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(dict(
    kb=kb, un=un, p1v=p1v, ms=round(min(times) * 1e3, 1),
    compile_s=round(compile_s),
    fingerprint=int(np.int64(bj.astype(np.int64).sum())),
)), flush=True)
"""


def main():
    configs = []
    for arg in sys.argv[1:] or ["16:4", "8:4", "16:2", "16:7", "16:9"]:
        parts = [int(x) for x in arg.split(":")]
        kb, un = parts[0], parts[1]
        p1v = parts[2] if len(parts) > 2 else 4
        configs.append((kb, un, p1v))
    timeout_s = float(os.environ.get("FREDDIE_WARM_TIMEOUT_S", "700"))
    useful_flops = 4 * P**3 * R * B
    fingerprint = None
    for kb, un, p1v in configs:
        cfg = (B, P, R, kb, un, p1v)
        for attempt in range(3):
            try:
                code = CHILD.replace("@REPO@", repr(REPO)).replace(
                    "@CFG@", repr(cfg))
                proc = subprocess.run(
                    [sys.executable, "-c", code],
                    timeout=timeout_s, capture_output=True, text=True,
                )
            except subprocess.TimeoutExpired:
                print(f"kb={kb} un={un} p1v={p1v}: attempt {attempt + 1} timed out",
                      flush=True)
                time.sleep(150)
                continue
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("RESULT ")), None)
            if proc.returncode == 0 and line:
                r = json.loads(line[len("RESULT "):])
                if fingerprint is None:
                    fingerprint = r["fingerprint"]
                tag = ("" if r["fingerprint"] == fingerprint
                       else "  RESULT MISMATCH vs first config!")
                dt = r["ms"] / 1e3
                print(
                    f"kb={kb:3d} un={un:2d} p1v={p1v}: {r['ms']:7.1f} ms  "
                    f"{B * R / dt / 1e6:6.2f}M read-reps/s  "
                    f"{useful_flops / dt / 1e12:5.2f} TFLOP/s useful  "
                    f"(compile+first {r['compile_s']}s){tag}",
                    flush=True,
                )
                break
            print(f"kb={kb} un={un} p1v={p1v}: attempt {attempt + 1} rc={proc.returncode}\n"
                  + proc.stderr[-1500:], flush=True)
            time.sleep(150)
        else:
            print(f"kb={kb} un={un} p1v={p1v}: FAILED after 3 attempts", flush=True)


if __name__ == "__main__":
    main()
