"""Loci-mesh construction and sharded DP solving.

The production segment stage routes phase B through solve_batch_sharded
whenever more than one local device is attached (ops.segdp.
solve_batch_device), so a multi-chip host is used by a single process
without operator intervention; results are bit-identical to the
single-device launch (tests/test_dist.py, test_segment_sharded).
"""

from __future__ import annotations

import numpy as np

_mesh_cache: dict = {}
_fn_cache: dict = {}


def loci_mesh(n_devices: int | None = None, local: bool = False):
    """A 1-D mesh over available devices with a single 'loci' axis.

    local=True restricts to this process's devices (the production
    segment-stage dispatch: in a multi-host run each process owns its
    locus shard and must not shard batches over other hosts' chips).
    Cached per device tuple: pjit compilation caches key on the mesh
    object, so callers must receive the same Mesh across dispatches.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    key = tuple(id(d) for d in devices)
    mesh = _mesh_cache.get(key)
    if mesh is None:
        mesh = Mesh(np.array(devices), ("loci",))
        _mesh_cache[key] = mesh
    return mesh


def _sharded_solver(mesh, read_support: int, scale: int,
                    use_pallas: bool = False, wide_weights: bool = True,
                    interpret: bool = False, return_chains: bool = False):
    """Jitted batch-sharded DP solver, cached per (mesh, read_support,
    scale, engine) so repeated dispatches reuse the compiled executable.

    use_pallas wraps the fused Pallas kernel in shard_map over the loci
    axis (each device runs the kernel on its local batch slice -- the
    XLA partitioner cannot split a pallas_call on its own), so a
    multi-chip TPU host gets Pallas speed on every chip; results are
    bit-identical to the XLA kernel (tests/test_dist.py guards via
    interpret mode on the CPU mesh)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.segdp import _solve_batch_jax, _walk_chains

    key = (mesh, read_support, scale, use_pallas, wide_weights, interpret,
           return_chains)
    fn = _fn_cache.get(key)
    if fn is None:
        batch_sh = NamedSharding(mesh, P("loci"))
        repl = NamedSharding(mesh, P())

        if use_pallas:
            from ..ops.segdp_pallas import solve_batch_pallas

            def kernel_local(C, y, W, n_cand, lookup):
                out = solve_batch_pallas(
                    C.astype("int32"), y, W, n_cand, read_support, lookup,
                    scale, interpret=interpret, wide_weights=wide_weights,
                )
                # The chain walk is per-problem, so it runs shard-locally.
                return _walk_chains(*out) if return_chains else out

            fn = jax.jit(jax.shard_map(
                kernel_local, mesh=mesh,
                in_specs=(P("loci"), P("loci"), P("loci"), P("loci"), P()),
                out_specs=P("loci") if return_chains
                else (P("loci"), P("loci"), P("loci")),
                check_vma=False,
            ))
        else:
            def kernel(C, y, W, n_cand, lookup):
                out = _solve_batch_jax(
                    C.astype("int32"), y, W, n_cand, read_support, lookup,
                    scale,
                )
                return _walk_chains(*out) if return_chains else out

            fn = jax.jit(
                kernel,
                in_shardings=(batch_sh, batch_sh, batch_sh, batch_sh, repl),
                out_shardings=batch_sh if return_chains
                else (batch_sh, batch_sh, batch_sh),
            )
        _fn_cache[key] = fn
    return fn


def solve_batch_sharded(C, y, W, n_cand, read_support, lookup, scale, mesh,
                        use_pallas: bool | None = None,
                        wide_weights: bool = True, interpret: bool = False,
                        return_chains: bool = False):
    """Run the batched segmentation DP with the batch dim sharded over the
    mesh's 'loci' axis. The batch size must be a multiple of the mesh size
    (callers pad with dummy problems). use_pallas=None auto-selects the
    shard_mapped Pallas kernel on TPU meshes (bit-identical, ~2x per
    chip), the XLA kernel elsewhere. return_chains=True walks the
    backpointers on device and returns (B, P+2) -1-terminated chains
    instead of (K, best_j, best_k) -- the production dispatch path."""
    import jax.numpy as jnp

    if use_pallas is None:
        use_pallas = all(d.platform == "tpu" for d in mesh.devices.flat)
    fn = _sharded_solver(mesh, read_support, scale, use_pallas=use_pallas,
                         wide_weights=wide_weights, interpret=interpret,
                         return_chains=return_chains)
    return fn(
        jnp.asarray(C),
        jnp.asarray(y),
        jnp.asarray(W),
        jnp.asarray(n_cand),
        jnp.asarray(lookup),
    )
