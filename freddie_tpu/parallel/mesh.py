"""Loci-mesh construction and sharded DP solving."""

from __future__ import annotations

import numpy as np


def loci_mesh(n_devices: int | None = None):
    """A 1-D mesh over available devices with a single 'loci' axis."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("loci",))


def solve_batch_sharded(C, y, W, n_cand, read_support, lookup, scale, mesh):
    """Run the batched segmentation DP with the batch dim sharded over the
    mesh's 'loci' axis. The batch size must be a multiple of the mesh size
    (callers pad with dummy problems)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.segdp import _solve_batch_jax

    batch_sh = NamedSharding(mesh, P("loci"))
    repl = NamedSharding(mesh, P())

    def kernel(C, y, W, n_cand, lookup):
        return _solve_batch_jax(C, y, W, n_cand, read_support, lookup, scale)

    fn = jax.jit(
        kernel,
        in_shardings=(batch_sh, batch_sh, batch_sh, batch_sh, repl),
        out_shardings=(batch_sh, batch_sh, batch_sh),
    )
    return fn(
        jnp.asarray(C),
        jnp.asarray(y),
        jnp.asarray(W),
        jnp.asarray(n_cand),
        jnp.asarray(lookup),
    )
