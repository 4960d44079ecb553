"""Environment scoping for spawned CPU-only worker pools.

The cluster/isoforms stages fan per-tint work over spawn process pools
(reproducing the reference's multiprocessing.Pool parallelism,
py/freddie_cluster.py:797-814, py/freddie_isoforms.py:274). Workers are
CPU-only by design: the remote TPU claim is exclusive, so only the
parent ever talks to the device. On an axon host, however, every fresh
interpreter runs the baked sitecustomize, which registers the axon
backend and pre-imports jax -- ~2.7 s of startup per worker (measured;
a bare interpreter is ~15 ms) paid for a backend the worker must not
touch anyway.

``cpu_worker_env`` scopes the parent's environment so children skip all
of it: removing ``PALLAS_AXON_POOL_IPS`` turns the sitecustomize into a
no-op (no axon registration, no jax pre-import -- jax stays a lazy
import that most workers never reach), and ``JAX_PLATFORMS=cpu`` pins
any import that does happen to the host CPU backend. The parent's
variables are restored on exit -- it may legitimately claim the TPU
later in the same run (e.g. the segment stage after cluster in a
resumed pipeline).
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def cpu_worker_env():
    """Scope os.environ so spawned children boot as plain CPU workers.

    Spawn reads the parent's environment at child launch, so this must
    wrap the pool's whole lifetime (workers launch lazily on submit).
    Not thread-safe against a concurrent TPU-child launch from another
    thread -- the stages run their pools sequentially.
    """
    saved_pool = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    saved_platforms = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        yield
    finally:
        if saved_pool is not None:
            os.environ["PALLAS_AXON_POOL_IPS"] = saved_pool
        if saved_platforms is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = saved_platforms
