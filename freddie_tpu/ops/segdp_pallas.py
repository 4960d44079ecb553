"""Pallas TPU kernel for the segmentation DP (fused, VMEM-resident).

The XLA path (ops.segdp._solve_batch_jax) streams (B,P,R) intermediates
through HBM; this kernel keeps one problem's entire working set in VMEM --
C (P,R), the pair tensors, the (P,P,P) outside tensor, and the DP state --
so HBM traffic is just C in and the backpointers out, and the inner
contractions are (P,R)x(R,P) MXU matmuls.

Each grid step processes a tile of TILE_B problems (an inner fori_loop;
amortizes per-step scheduling overhead). Per problem:

  phase 1: for k in 0..P-1: threshold C against the precomputed scaled
           bounds, two matmuls -> outside(.,k,.) slice + inside column;
  phase 2: backward wavefront over j: H[j,k] = inside(j,k) +
           max_k_ (outside(j,k,k_) + H[k,k_]) with min-segment masks,
           recording first-argmax backpointers;
  phase 3: top-level D0 row-major first-argmax vs the no-segmentation
           baseline; the chosen (j,k) pair is stashed in K's last row
           (never read by chain walking).

Bit-identical to ops.segdp.solve_host (integer thresholds, f32 scores).
Threshold products are precomputed outside the kernel as (B,P,P) int32
T_hi/T_lo (avoids in-kernel gathers from the length table); C arrives
pre-multiplied by `scale` so thresholding is one subtract + compare.
"""

from __future__ import annotations

import functools

TILE_B = 8  # problems per grid step


def _kernel(n_ref, C_ref, y_ref, W_ref, Thi_ref, Tlo_ref, ThiT_ref, TloT_ref,
            K_ref,
            O_ref, IN_ref, IN2_ref, H_ref, SM_ref,
            *, P, R, tile_b, read_support):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    neg = jnp.float32(-jnp.inf)
    gate = jnp.float32(read_support)
    kk_row = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)  # second index
    kk_col = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)  # first index
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)  # (1, P)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    big = jnp.int32(P)
    pid = pl.program_id(0)

    def per_problem(b, _):
        n = n_ref[pid * tile_b + b]
        end = n - 1
        W = W_ref[b]  # (1, R) f32
        y = y_ref[b]  # (1, P) int32
        SM_ref[...] = ((y - jnp.transpose(y)) < 5).astype(jnp.float32)
        w_sum = jnp.sum(W)

        # phase 1: outside slices O[k][j, k_] and inside rows IN[k, p].
        def phase1(k, _):
            C_all = C_ref[b]  # (P, R) int32, pre-scaled
            C_k = C_ref[b, pl.ds(k, 1), :]  # (1, R)
            d_to = C_k - C_all  # (P, R): scale*(C[k]-C[p])
            # transposed copies put the dynamic index on the sublane dim
            thi_col = jnp.transpose(ThiT_ref[b, pl.ds(k, 1), :])  # (P, 1)
            tlo_col = jnp.transpose(TloT_ref[b, pl.ds(k, 1), :])
            yeaW = jnp.where(d_to > thi_col, W, zero)  # (P, R)
            nayW = jnp.where(d_to < tlo_col, W, zero)
            thi_row = jnp.transpose(Thi_ref[b, pl.ds(k, 1), :])  # (P, 1)
            tlo_row = jnp.transpose(Tlo_ref[b, pl.ds(k, 1), :])
            d_from = -d_to
            yea_from = jnp.where(d_from > thi_row, one, zero)
            nay_from = jnp.where(d_from < tlo_row, one, zero)
            out_k = jax.lax.dot_general(
                yeaW, nay_from, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                nayW, yea_from, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, P): [j, k_]
            O_ref[pl.ds(k, 1)] = jnp.where(out_k < gate, neg, out_k)[None]
            IN_ref[pl.ds(k, 1), :] = jnp.transpose(
                -(w_sum - jnp.sum(yeaW, axis=1, keepdims=True)
                  - jnp.sum(nayW, axis=1, keepdims=True))
            )
            return 0

        jax.lax.fori_loop(0, P, phase1, 0, unroll=False)

        # IN2[p, k] = inside(p, k) (transposed copy for sublane-dim reads).
        IN2_ref[...] = jnp.transpose(IN_ref[...])

        small = SM_ref[...]  # (P, P) f32 0/1
        in_end_row = IN_ref[pl.ds(end, 1), :]  # (1, P): inside(., end)
        H_ref[...] = jnp.where(
            (kk_row == end) & (kk_col < end), jnp.transpose(in_end_row), neg
        )
        K_ref[b] = jnp.full((P, P), -1, dtype=jnp.int32)
        kmask = (kk_row > kk_col) & (kk_row <= end) & (small == 0.0)

        # phase 2: backward wavefront over j = P-2 .. 0. O is laid out
        # [k][j, k_], so the plane for step j is O[:, j, :].
        def phase2(t, _):
            j = P - 2 - t
            O_plane = O_ref[:, pl.ds(j, 1), :][:, 0, :]  # (P_k, P_k_)
            vals = jnp.where(kmask, O_plane + H_ref[...], neg)
            row_max = jnp.max(vals, axis=1, keepdims=True)  # (P, 1)
            # first index attaining the max (argmax lowering unsupported)
            first_arg = jnp.min(
                jnp.where(vals == row_max, kk_row, big), axis=1, keepdims=True
            )
            row_arg = jnp.transpose(first_arg)  # (1, P)
            in_j = IN2_ref[pl.ds(j, 1), :]  # (1, P): inside(j, .)
            small_j = SM_ref[pl.ds(j, 1), :]
            valid_k = (
                (col_i > j) & (col_i < end)
                & (small_j == 0.0)
                & (jnp.transpose(row_max) > neg)
            )
            row_H = jnp.where(valid_k, in_j + jnp.transpose(row_max), neg)
            keep_end = (col_i == end) & (j < end)
            row_H = jnp.where(keep_end, in_j, row_H)
            H_ref[pl.ds(j, 1), :] = row_H
            K_ref[b, pl.ds(j, 1), :] = jnp.where(valid_k, row_arg, -1)
            return 0

        jax.lax.fori_loop(0, P - 1, phase2, 0, unroll=False)

        # phase 3: D0[j, k] = inside(0, j) + outside(0, j, k) + H[j, k].
        O_plane0 = O_ref[:, pl.ds(0, 1), :][:, 0, :]  # (P_j, P_k)
        in0 = jnp.transpose(IN2_ref[pl.ds(0, 1), :])  # (P, 1): inside(0, j)
        small0 = SM_ref[pl.ds(0, 1), :]  # (1, P): small(0, j)
        jmask = (
            (kk_col > 0) & (kk_col < end)
            & (kk_row > kk_col) & (kk_row <= end)
            & (jnp.transpose(small0) == 0.0)
            & (small == 0.0)
        )
        D0 = jnp.where(jmask, in0 + O_plane0 + H_ref[...], neg)
        # row-major first argmax without a (1, P*P) reshape
        best = jnp.max(D0)
        is_max = D0 == best
        any_row = jnp.any(is_max, axis=1, keepdims=True)  # (P, 1)
        jm = jnp.min(jnp.where(any_row, row_iota, big))
        km = jnp.min(jnp.where(is_max & (kk_col == jm), kk_row, big))
        baseline = in_end_row[0, 0]  # inside(0, end)
        ok = best > baseline
        bj = jnp.where(ok, jm, -1)
        bk = jnp.where(ok, km, -1)
        K_ref[b, pl.ds(P - 1, 1), :] = jnp.where(
            lane == 0, bj, jnp.where(lane == 1, bk, -1)
        )
        return 0

    jax.lax.fori_loop(0, tile_b, per_problem, 0, unroll=False)


def solve_batch_pallas(C, y, W, n_cand, read_support, lookup, scale,
                       interpret=False):
    """Same contract as ops.segdp._solve_batch_jax: returns (K, best_j,
    best_k). C:(B,P,R) i32, y:(B,P) i32, W:(B,R) f32, n_cand:(B,) i32.
    The batch is padded to a multiple of TILE_B internally."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B0 = C.shape[0]
    pad = (-B0) % TILE_B
    if pad:
        C = np.concatenate([C, np.repeat(C[-1:], pad, axis=0)])
        y = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
        W = np.concatenate([W, np.repeat(W[-1:], pad, axis=0)])
        n_cand = np.concatenate([n_cand, np.repeat(n_cand[-1:], pad, axis=0)])
    B, P, R = C.shape
    L = lookup.shape[0] - 1
    # Precompute scaled threshold products (cheap, XLA): (B,P,P) int32.
    seg_len = y[:, None, :] - y[:, :, None] + 1
    h = jnp.asarray(lookup)[jnp.minimum(jnp.maximum(seg_len, 0), L)]
    T_hi = (h * seg_len).astype(jnp.int32)
    T_lo = ((scale - h) * seg_len).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, P=P, R=R, tile_b=TILE_B, read_support=read_support
    )
    TB = TILE_B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, P, R), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, R), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, P, P), jnp.float32),  # O [k][j, k_], gated
            pltpu.VMEM((P, P), jnp.float32),  # IN: IN[k, p] = inside(p, k)
            pltpu.VMEM((P, P), jnp.float32),  # IN2 = transpose(IN)
            pltpu.VMEM((P, P), jnp.float32),  # H
            pltpu.VMEM((P, P), jnp.float32),  # small
        ],
    )
    (K,) = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, P, P), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(n_cand, jnp.int32),
        jnp.asarray(C, jnp.int32) * jnp.int32(scale),
        jnp.asarray(y, jnp.int32)[:, None, :],
        jnp.asarray(W, jnp.float32)[:, None, :],
        T_hi,
        T_lo,
        jnp.swapaxes(T_hi, 1, 2),
        jnp.swapaxes(T_lo, 1, 2),
    )
    K = K[:B0]
    return K, K[:, P - 1, 0], K[:, P - 1, 1]
