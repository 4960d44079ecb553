"""Pallas TPU kernel for the segmentation DP (fused, VMEM-resident).

Note: one problem per grid step. Tiling several problems per step behind
an inner fori_loop was tried to amortize scheduling overhead, but the
dynamic leading-index ref access it requires multiplies Mosaic compile
time past practicality on this remote-compile backend; the per-step cost
is accepted instead.

The XLA path (ops.segdp._solve_batch_jax) streams (B,P,R) intermediates
through HBM; this kernel keeps one problem's entire working set in VMEM --
C (P,R), the pair tensors, the (P,P,P) outside tensor, and the DP state --
so HBM traffic is just C in and the backpointers out, and the inner
contractions are (P,R)x(R,P) MXU matmuls.

Per grid step (one problem):
  phase 1: for k in 0..P-1: threshold C against the precomputed scaled
           bounds, two matmuls -> outside(.,k,.) slice + inside column;
  phase 2: backward wavefront over j: H[j,k] = inside(j,k) +
           max_k_ (outside(j,k,k_) + H[k,k_]) with min-segment masks,
           recording first-argmax backpointers;
  phase 3: top-level D0 row-major first-argmax vs the no-segmentation
           baseline.

Bit-identical to ops.segdp.solve_host (integer thresholds, f32 scores).
Threshold products are precomputed outside the kernel as (B,P,P) int32
T_hi/T_lo (avoids in-kernel gathers from the length table).
"""

from __future__ import annotations

import functools


def _kernel(n_ref, C_ref, y_ref, W_ref, Thi_ref, Tlo_ref, ThiT_ref, TloT_ref,
            K_ref,
            O_ref, IN_ref, IN2_ref, H_ref, SM_ref,
            *, P, R, scale, read_support, wide_weights, unroll1=False, unroll2=False, phases=3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    neg = jnp.float32(-jnp.inf)
    n = n_ref[pl.program_id(0)]
    end = n - 1

    W = W_ref[0]  # (1, R) f32
    y = y_ref[0]  # (1, P) int32

    # small(a,b) = y[b]-y[a] < 5, stored as f32 0/1.
    SM_ref[...] = ((y - jnp.transpose(y)) < 5).astype(jnp.float32)

    w_sum = jnp.sum(W)
    gate = jnp.float32(read_support)
    # The MXU's default f32 lowering rounds operands to bf16 (one pass);
    # weights above 256 would lose bits. Splitting the integer weights
    # into a 7-bit low part and a high part keeps every operand exactly
    # representable in bf16 (products and f32 accumulation then exact for
    # any weight <= 16383) while staying on the fast single-pass path;
    # when all weights fit 7 bits (the common case, checked by the
    # dispatcher) the high-part matmuls are compiled out entirely.
    W_int = W.astype(jnp.int32)
    W_lo = (W_int & 127).astype(jnp.float32)  # (1, R)
    W_hi = (W_int >> 7).astype(jnp.float32)

    # ---- phase 1: outside slices O[k][j, k_] = outside(j, k, k_) and
    # inside rows IN[k, p] = inside(p, k).
    def phase1(k, _):
        # C arrives pre-multiplied by `scale` (one subtract + compare per
        # threshold); weighted indicators come from selects, cheaper on
        # the VPU than cast + multiply.
        C_all = C_ref[0]  # (P, R) int32, pre-scaled
        C_k = C_ref[0, pl.ds(k, 1), :]  # (1, R)
        d_to = C_k - C_all  # (P, R): scale*(C[k]-C[p])
        # (p, k) products come from the transposed copies so the dynamic
        # index lands on the sublane dim (Mosaic forbids dynamic lane
        # slicing).
        thi_col = jnp.transpose(ThiT_ref[0, pl.ds(k, 1), :])  # (P, 1)
        tlo_col = jnp.transpose(TloT_ref[0, pl.ds(k, 1), :])
        yea_to = d_to > thi_col  # (P, R) bool
        nay_to = d_to < tlo_col
        thi_row = jnp.transpose(Thi_ref[0, pl.ds(k, 1), :])  # (P, 1): (k, p)
        tlo_row = jnp.transpose(Tlo_ref[0, pl.ds(k, 1), :])
        d_from = -d_to
        zero = jnp.float32(0.0)
        one = jnp.float32(1.0)
        yea_from = jnp.where(d_from > thi_row, one, zero)
        nay_from = jnp.where(d_from < tlo_row, one, zero)

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        yw_lo = jnp.where(yea_to, W_lo, zero)  # (P, R)
        nw_lo = jnp.where(nay_to, W_lo, zero)
        out_k = dot(yw_lo, nay_from) + dot(nw_lo, yea_from)  # (P, P): [j, k_]
        sum_yw = jnp.sum(yw_lo, axis=1, keepdims=True)
        sum_nw = jnp.sum(nw_lo, axis=1, keepdims=True)
        if wide_weights:
            yw_hi = jnp.where(yea_to, W_hi, zero)
            nw_hi = jnp.where(nay_to, W_hi, zero)
            out_k = out_k + 128.0 * (dot(yw_hi, nay_from) + dot(nw_hi, yea_from))
            sum_yw = sum_yw + 128.0 * jnp.sum(yw_hi, axis=1, keepdims=True)
            sum_nw = sum_nw + 128.0 * jnp.sum(nw_hi, axis=1, keepdims=True)
        in_col = -(w_sum - sum_yw - sum_nw)
        O_ref[pl.ds(k, 1)] = jnp.where(out_k < gate, neg, out_k)[None]
        IN_ref[pl.ds(k, 1), :] = jnp.transpose(in_col)
        return 0

    jax.lax.fori_loop(0, P, phase1, 0, unroll=(P if unroll1 else False))
    if phases < 2:
        K_ref[0] = jnp.full((P, P), -1, dtype=jnp.int32)
        return

    # IN2[p, k] = inside(p, k) (transposed copy for sublane-dim reads).
    IN2_ref[...] = jnp.transpose(IN_ref[...])

    small = SM_ref[...]  # (P, P) f32 0/1
    kk_row = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)  # second index
    kk_col = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)  # first index

    # H init: column `end` = inside(j, end) for j < end; else -inf.
    in_end_row = IN_ref[pl.ds(end, 1), :]  # (1, P): inside(., end)
    H_ref[...] = jnp.where(
        (kk_row == end) & (kk_col < end), jnp.transpose(in_end_row), neg
    )
    K_ref[0] = jnp.full((P, P), -1, dtype=jnp.int32)

    kmask_static = (kk_row > kk_col) & (kk_row <= end) & (small == 0.0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)  # (1, P)

    # ---- phase 2: backward wavefront over j = P-2 .. 0. The "outside"
    # tensor O is laid out [k][j, k_]; the row we need at step j is
    # O[., j, .], i.e. row j of every leading slice -- but the DP only
    # reads pairs (k, k_) with k > j, and O[k][j, k_] = outside(j, k, k_),
    # so gather the (P, P) plane vals[k, k_] = O[k, j, k_].
    def phase2(t, _):
        j = P - 2 - t
        O_plane = O_ref[:, pl.ds(j, 1), :][:, 0, :]  # (P_k, P_k_)
        vals = jnp.where(kmask_static, O_plane + H_ref[...], neg)
        row_max = jnp.max(vals, axis=1, keepdims=True)  # (P, 1) over k_
        # First index attaining the max (argmax lowering is unsupported
        # here; min-of-masked-iota is equivalent and VPU-friendly).
        first_arg = jnp.min(
            jnp.where(vals == row_max, kk_row, jnp.int32(P)),
            axis=1, keepdims=True,
        )  # (P, 1)
        row_arg = jnp.transpose(first_arg)  # (1, P)
        in_j = IN2_ref[pl.ds(j, 1), :]  # (1, P): inside(j, k) over k
        small_j = SM_ref[pl.ds(j, 1), :]  # (1, P): small(j, k)
        valid_k = (
            (col_i > j) & (col_i < end)
            & (small_j == 0.0)
            & (jnp.transpose(row_max) > neg)
        )  # (1, P)
        row_H = jnp.where(valid_k, in_j + jnp.transpose(row_max), neg)
        keep_end = (col_i == end) & (j < end)
        row_H = jnp.where(keep_end, in_j, row_H)
        H_ref[pl.ds(j, 1), :] = row_H
        K_ref[0, pl.ds(j, 1), :] = jnp.where(valid_k, row_arg, -1)
        return 0

    jax.lax.fori_loop(0, P - 1, phase2, 0, unroll=(P - 1 if unroll2 else False))
    if phases < 3:
        return

    # ---- phase 3: D0[j, k] = inside(0, j) + outside(0, j, k) + H[j, k].
    # outside(0, j, k) = O[j][0, k] -> plane [j, k] = O[:, 0, :].
    O_plane0 = O_ref[:, pl.ds(0, 1), :][:, 0, :]  # (P_j, P_k)
    # inside(0, j) over j: IN2[p, k] = inside(p, k) -> row 0 of IN2.
    in0 = jnp.transpose(IN2_ref[pl.ds(0, 1), :])  # (P, 1)
    small0 = SM_ref[pl.ds(0, 1), :]  # (1, P): small(0, j)
    jmask = (
        (kk_col > 0) & (kk_col < end)
        & (kk_row > kk_col) & (kk_row <= end)
        & (jnp.transpose(small0) == 0.0)
        & (small == 0.0)
    )
    D0 = jnp.where(jmask, in0 + O_plane0 + H_ref[...], neg)
    # Row-major first argmax without a (1, P*P) reshape (unsupported shape
    # cast in Mosaic): first row attaining the global max, then the first
    # column within the mask.
    best = jnp.max(D0)
    is_max = D0 == best
    big = jnp.int32(P)
    any_row = jnp.any(is_max, axis=1, keepdims=True)  # (P, 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    jm = jnp.min(jnp.where(any_row, row_iota, big))
    km = jnp.min(jnp.where(is_max & (kk_col == jm), kk_row, big))
    baseline = in_end_row[0, 0]  # inside(0, end)
    ok = best > baseline
    # Stash the top-level pair in K's last row (row P-1 is never read by
    # chain walking: backpointers are read at (j, k) with j <= end-1).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    bj = jnp.where(ok, jm, -1)
    bk = jnp.where(ok, km, -1)
    K_ref[0, pl.ds(P - 1, 1), :] = jnp.where(
        lane == 0, bj, jnp.where(lane == 1, bk, -1)
    )


def solve_batch_pallas(C, y, W, n_cand, read_support, lookup, scale,
                       interpret=False, wide_weights=True,
                       unroll1=False, unroll2=False, phases=3):
    """Same contract as ops.segdp._solve_batch_jax: returns (K, best_j,
    best_k). C:(B,P,R) i32, y:(B,P) i32, W:(B,R) f32, n_cand:(B,) i32.

    The pair contractions split the integer weights into 7-bit low and
    high parts so the MXU's fast single-pass bf16 lowering stays EXACT
    for any weight <= 16383 (unsplit f32 operands above 256 would lose
    mantissa bits in that lowering). wide_weights=False skips the
    high-part matmuls -- valid only when every weight <= 127
    (solve_batch_device checks and passes this)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P, R = C.shape
    L = lookup.shape[0] - 1
    # Precompute scaled threshold products (cheap, XLA): (B,P,P) int32.
    seg_len = y[:, None, :] - y[:, :, None] + 1
    hp = jnp.asarray(lookup)[jnp.minimum(jnp.maximum(seg_len, 0), L)]
    h, eq = hp >> 1, hp & 1  # packed lookup: h_scaled*2 + eq_nay bit
    T_hi = (h * seg_len).astype(jnp.int32)
    # +eq makes a ratio exactly at 1-h count as nay when the reference's
    # float 1-h sits above the exact decimal (ops/thresholds.py docstring).
    T_lo = ((scale - h) * seg_len + eq).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, P=P, R=R, scale=scale, read_support=read_support,
        wide_weights=wide_weights, unroll1=unroll1, unroll2=unroll2,
        phases=phases,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, R), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, P), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
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
    return K, K[:, P - 1, 0], K[:, P - 1, 1]
