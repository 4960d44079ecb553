#!/usr/bin/env python3
"""Phase-profile the DP Pallas kernel on the attached chip.

Runs the kernel at the bench config (B=2048, P=64, R=512) with the
`phases` static set to 1 (stop after phase 1), 2 (stop after the
wavefront), and 3 (full), each in its own subprocess (the axon
remote-compile backend wedges after ~2 fresh Mosaic compiles per
process; see tools/warm_kernels.py). Prints one line per config.

Usage: python tools/profile_kernel_phases.py [phases ...]
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

B, P, R, phases = @CFG@
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
                              "kb_override", "un", "p1v", "phases"))
t0 = time.perf_counter()
out = fn(C, y, W, n, read_support=3, lookup=lookup, scale=thr.scale,
         wide_weights=False, phases=phases)
bj = np.asarray(out[1])
compile_s = time.perf_counter() - t0
times = []
for _ in range(3):
    t0 = time.perf_counter()
    out = fn(C, y, W, n, read_support=3, lookup=lookup, scale=thr.scale,
             wide_weights=False, phases=phases)
    _ = np.asarray(out[1])
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(dict(
    phases=phases, ms=round(min(times) * 1e3, 1), compile_s=round(compile_s),
)), flush=True)
"""


def main():
    phase_list = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    timeout_s = float(os.environ.get("FREDDIE_WARM_TIMEOUT_S", "700"))
    for phases in phase_list:
        cfg = (B, P, R, phases)
        for attempt in range(3):
            try:
                code = CHILD.replace("@REPO@", repr(REPO)).replace(
                    "@CFG@", repr(cfg))
                proc = subprocess.run(
                    [sys.executable, "-c", code],
                    timeout=timeout_s, capture_output=True, text=True,
                )
            except subprocess.TimeoutExpired:
                print(f"phases={phases}: attempt {attempt + 1} timed out", flush=True)
                time.sleep(150)
                continue
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("RESULT ")), None)
            if proc.returncode == 0 and line:
                r = json.loads(line[len("RESULT "):])
                print(f"phases={phases}: {r['ms']:7.1f} ms  "
                      f"(compile+first {r['compile_s']}s)", flush=True)
                break
            print(f"phases={phases}: attempt {attempt + 1} rc={proc.returncode}\n"
                  + proc.stderr[-1500:], flush=True)
            time.sleep(150)
        else:
            print(f"phases={phases}: FAILED after 3 attempts", flush=True)


if __name__ == "__main__":
    main()
