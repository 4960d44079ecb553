"""Pallas TPU kernel for the segmentation DP (fused, VMEM-resident).

Note: one problem per grid step. Tiling several problems per step behind
an inner fori_loop was tried to amortize scheduling overhead, but the
dynamic leading-index ref access it requires multiplies Mosaic compile
time past practicality on this remote-compile backend; instead the
phases are structured to minimize per-iteration sequencing cost (on-chip
phase profiling at B=2048, P=64, R=512 showed the original 64 thin per-k
phase-1 steps costing 170 ms of a 218 ms launch while the matmuls cost
~4 ms -- the kernel is sequencing/VPU-bound, not FLOP-bound).

The XLA path (ops.segdp._solve_batch_jax) streams (B,P,R) intermediates
through HBM; this kernel keeps one problem's entire working set in VMEM --
C (P,R), the pair tensors, the (P,P,P) outside tensor, and the DP state --
so HBM traffic is just C in and the backpointers out, and the inner
contractions are MXU matmuls.

Per grid step (one problem):
  phase 1 (blocked): KB leading-k values per loop iteration; 3-D
           threshold compares build the weighted/plain indicator blocks,
           one batched (KB,P,R)x(KB,P,R) dot per product -> KB
           outside(.,k,.) slices + inside rows at once;
  phase 1.5: one bulk transpose OT[j][k,k_] = O[k][j,k_] so every
           wavefront step reads a contiguous plane;
  phase 2: backward wavefront over j: H[j,k] = inside(j,k) +
           max_k_ (outside(j,k,k_) + H[k,k_]) with min-segment masks,
           recording first-argmax backpointers; four j-steps per loop
           iteration (strictly sequential, but batching steps amortizes
           loop management);
  phase 3: top-level D0 row-major first-argmax vs the no-segmentation
           baseline.

Bit-identical to ops.segdp.solve_host (integer thresholds, f32 scores;
the weight-split trick in phase 1 keeps the fast single-pass MXU path
exact for any integer weight <= 16383). Threshold products are
precomputed outside the kernel as (B,P,P) int32 T_hi/T_lo (avoids
in-kernel gathers from the length table). Debug statics: `phases` stops
after phase 1 or 2 (phase profiling); `blocked=False` restores the
per-k phase-1 loop; `unroll1/unroll2` fully unroll the loops.
"""

from __future__ import annotations

import functools


def _phase1_block(P: int, R: int, wide_weights: bool, p1v: int = 2) -> int:
    """Leading-k block size for phase 1: the largest power-of-two divisor
    of P whose live block tensors (one int32 + four/six f32 (KB,P,R) --
    or bf16 halves for p1v=3) stay within ~8 MB of VMEM (the (P,P,P)
    outside tensor, C, and the DP state take the rest of the ~16 MB
    budget)."""
    n_ind = 6 if wide_weights else 4
    # p1v=3 halves the indicator bytes (bf16) but adds the two (KB,P+1,R)
    # concat copies; other variants keep the original f32 accounting so
    # their compiled block shapes are unchanged.
    elem = 4 + 2 * (n_ind + 2) if p1v == 3 else 4 * (1 + n_ind)
    budget = 11 << 20
    kb = P
    while kb > 1 and kb * P * R * elem > budget:
        kb //= 2
    return kb


def _kernel(n_ref, C_ref, y_ref, W_ref, Thi_ref, Tlo_ref, ThiT_ref, TloT_ref,
            K_ref,
            O_ref, OT_ref, IN_ref, IN2_ref, H_ref, SM_ref, *extra_scratch,
            P, R, scale, read_support, wide_weights, blocked=True,
            unroll1=False, unroll2=False, phases=3, kb_override=0, un=4,
            p1v=4):
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

    # ---- phase 1 (blocked): outside slices O[k][j, k_] = outside(j, k, k_)
    # and inside rows IN[k, p] = inside(p, k), KB leading-k values per loop
    # iteration. The per-k loop was sequencing-bound (64 thin steps cost
    # ~170 ms/2048 problems while the matmuls cost ~4 ms); fat 3-D blocks
    # amortize instruction issue and let the contraction run as one
    # batched dot per block.
    KB = kb_override or _phase1_block(P, R, wide_weights, p1v)

    if p1v == 4:
        # Pre-padded "from"-indicator scratches: rows [0, P) receive the
        # per-block selects, row P is the constant ones sublane (written
        # once, reused by every block), so the two per-block (KB, P, R)
        # concat copies of p1v=2 disappear -- the dots read the scratch.
        NE_ref, YE_ref = extra_scratch
        NE_ref[:, pl.ds(P, 1), :] = jnp.ones((KB, 1, R), jnp.float32)
        YE_ref[:, pl.ds(P, 1), :] = jnp.ones((KB, 1, R), jnp.float32)

    def phase1_blocked(t, _):
        k0 = t * KB
        C_all = C_ref[0]  # (P, R) int32, pre-scaled
        C_blk = C_ref[0, pl.ds(k0, KB), :]  # (KB, R)
        T1 = C_blk[:, None, :] - C_all[None, :, :]  # (KB, P, R): k vs p
        thiT = ThiT_ref[0, pl.ds(k0, KB), :][:, :, None]  # (KB, P, 1): (p, k)
        tloT = TloT_ref[0, pl.ds(k0, KB), :][:, :, None]
        thi = Thi_ref[0, pl.ds(k0, KB), :][:, :, None]  # (KB, P, 1): (k, p)
        tlo = Tlo_ref[0, pl.ds(k0, KB), :][:, :, None]
        zero = jnp.float32(0.0)
        one = jnp.float32(1.0)

        def from_indicators(dtype):
            # The "from" compares (-T1 vs t) fold the negation into the
            # threshold side: -T1 > thi == T1 < -thi. Negating the
            # (KB, P, 1) thresholds costs KB*P ops instead of a full
            # (KB, P, R) pass.
            o = jnp.array(1.0, dtype)
            z = jnp.array(0.0, dtype)
            return (jnp.where(T1 < -thi, o, z),  # yea, pair (k0+i, p)
                    jnp.where(T1 > -tlo, o, z))  # nay

        def bdot(a, b):
            return jax.lax.dot_general(
                a, b, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        if p1v == 1:
            # Experimental pass-reduced variant (p1v=1, NOT the default):
            # weighted indicators straight from the T1 compares and row
            # sums as MXU ones-dots. Bit-identical in interpret mode, but
            # the axon Mosaic backend rejects it ("only constant
            # accumulators supported": the ones-dot canonicalizes to a
            # vector.multi_reduction and the + chain fuses into its
            # accumulator), and the fused selects alone do not change the
            # real VPU op count (a cmp+select pair costs the same whether
            # the mask is named or not). Kept for A/B on backends where
            # the MXU sum lowers properly (tools/sweep_kernel.py kb:un:1).
            yea_from, nay_from = from_indicators(jnp.float32)
            yw_lo = jnp.where(T1 > thiT, W_lo[None], zero)  # (KB, P, R)
            nw_lo = jnp.where(T1 < tloT, W_lo[None], zero)
            ones_r = jnp.ones((KB, 1, R), jnp.float32)
            out_blk = bdot(yw_lo, nay_from) + bdot(nw_lo, yea_from)
            sums = bdot(yw_lo, ones_r) + bdot(nw_lo, ones_r)  # (KB, P, 1)
            if wide_weights:
                yw_hi = jnp.where(T1 > thiT, W_hi[None], zero)
                nw_hi = jnp.where(T1 < tloT, W_hi[None], zero)
                out_blk = out_blk + 128.0 * (
                    bdot(yw_hi, nay_from) + bdot(nw_hi, yea_from))
                sums = sums + 128.0 * (bdot(yw_hi, ones_r) + bdot(nw_hi, ones_r))
            O_ref[pl.ds(k0, KB)] = jnp.where(out_blk < gate, neg, out_blk)
            IN_ref[pl.ds(k0, KB), :] = sums[:, :, 0] - w_sum
            return 0

        if p1v == 3:
            # p1v=2 with bf16 indicator operands. Every value in the pair
            # tensors is an integer 0..127 (indicator times a 7-bit weight
            # part), exactly representable in bf16 -- and the f32 MXU path
            # rounds operands to bf16 anyway, so the products (and their
            # exact f32 accumulation: <= R*127 < 2^24) are bit-identical
            # (tests/test_segdp.py::test_pallas_p1v3_bit_identical). The
            # win would be bandwidth: the six (KB, P, R) select/concat
            # passes store HALF the bytes, and the halved VMEM footprint
            # admits a larger KB (fewer sequencing iterations).
            #
            # NOT the default: the axon remote-compile Mosaic rejects it
            # ("Invalid relayout ... vector<KBx64x512xi1>: (8,128) ->
            # (16,128)" -- the i32 compare's i1 mask cannot retile to the
            # bf16 select's packing; measured 2026-08-19, same class of
            # block as the int8 contraction). Kept, like p1v=1, for A/B
            # on local-compile backends (tools/sweep_kernel.py kb:un:3).
            bzero = jnp.bfloat16(0.0)
            ones_row = jnp.ones((KB, 1, R), jnp.bfloat16)
            yea_fb, nay_fb = from_indicators(jnp.bfloat16)
            W_lob = W_lo.astype(jnp.bfloat16)
            yea_to = T1 > thiT
            nay_to = T1 < tloT
            yw_lo = jnp.where(yea_to, W_lob[None], bzero)  # (KB, P, R)
            nw_lo = jnp.where(nay_to, W_lob[None], bzero)
            nay_ext = jnp.concatenate([nay_fb, ones_row], axis=1)
            yea_ext = jnp.concatenate([yea_fb, ones_row], axis=1)
            ey = bdot(yw_lo, nay_ext)  # (KB, P, P+1) f32
            en = bdot(nw_lo, yea_ext)
            out_blk = ey[:, :, :P] + en[:, :, :P]
            sums = ey[:, :, P] + en[:, :, P]  # (KB, P)
            if wide_weights:
                W_hib = W_hi.astype(jnp.bfloat16)
                yw_hi = jnp.where(yea_to, W_hib[None], bzero)
                nw_hi = jnp.where(nay_to, W_hib[None], bzero)
                ey_hi = bdot(yw_hi, nay_ext)
                en_hi = bdot(nw_hi, yea_ext)
                out_blk = out_blk + 128.0 * (ey_hi[:, :, :P] + en_hi[:, :, :P])
                sums = sums + 128.0 * (ey_hi[:, :, P] + en_hi[:, :, P])
            O_ref[pl.ds(k0, KB)] = jnp.where(out_blk < gate, neg, out_blk)
            IN_ref[pl.ds(k0, KB), :] = -(w_sum - sums)
            return 0

        if p1v == 4:
            # p1v=2 minus the concat copies: the "from" selects write
            # straight into the pre-padded scratches (ones sublane at row
            # P written once outside the loop), so two full (KB, P, R)
            # copy passes disappear. Value-identical to p1v=2 by
            # construction (the scratch contents equal the concat).
            yea_fb, nay_fb = from_indicators(jnp.float32)
            NE_ref[:, pl.ds(0, P), :] = nay_fb
            YE_ref[:, pl.ds(0, P), :] = yea_fb
            yea_to = T1 > thiT  # pair (p, k0+i)
            nay_to = T1 < tloT
            yw_lo = jnp.where(yea_to, W_lo[None], zero)  # (KB, P, R)
            nw_lo = jnp.where(nay_to, W_lo[None], zero)
            ey = bdot(yw_lo, NE_ref[...])  # (KB, P, P+1)
            en = bdot(nw_lo, YE_ref[...])
            out_blk = ey[:, :, :P] + en[:, :, :P]
            sums = ey[:, :, P] + en[:, :, P]  # (KB, P)
            if wide_weights:
                yw_hi = jnp.where(yea_to, W_hi[None], zero)
                nw_hi = jnp.where(nay_to, W_hi[None], zero)
                ey_hi = bdot(yw_hi, NE_ref[...])
                en_hi = bdot(nw_hi, YE_ref[...])
                out_blk = out_blk + 128.0 * (ey_hi[:, :, :P] + en_hi[:, :, :P])
                sums = sums + 128.0 * (ey_hi[:, :, P] + en_hi[:, :, P])
            O_ref[pl.ds(k0, KB)] = jnp.where(out_blk < gate, neg, out_blk)
            IN_ref[pl.ds(k0, KB), :] = -(w_sum - sums)
            return 0

        if p1v == 2:
            # Row sums folded into the SAME MXU dots via an appended
            # all-ones sublane on the "from" operands: column P of each
            # (KB, P, P+1) product is the row sum of the weighted
            # indicator, so the two explicit (KB, P, R) VPU sum passes
            # disappear. (The standalone ones-dot variant, p1v=1, is
            # rejected by this backend's Mosaic -- its canonicalization
            # turns the dot into a vector.multi_reduction with a fused
            # accumulator; appending to an existing dot sidesteps that.)
            # Bit-identical: products and f32 accumulation stay exact.
            ones_row = jnp.ones((KB, 1, R), jnp.float32)
            yea_from, nay_from = from_indicators(jnp.float32)
            yea_to = T1 > thiT  # pair (p, k0+i)
            nay_to = T1 < tloT
            yw_lo = jnp.where(yea_to, W_lo[None], zero)  # (KB, P, R)
            nw_lo = jnp.where(nay_to, W_lo[None], zero)
            nay_ext = jnp.concatenate([nay_from, ones_row], axis=1)
            yea_ext = jnp.concatenate([yea_from, ones_row], axis=1)
            ey = bdot(yw_lo, nay_ext)  # (KB, P, P+1)
            en = bdot(nw_lo, yea_ext)
            out_blk = ey[:, :, :P] + en[:, :, :P]
            sums = ey[:, :, P] + en[:, :, P]  # (KB, P)
            if wide_weights:
                yw_hi = jnp.where(yea_to, W_hi[None], zero)
                nw_hi = jnp.where(nay_to, W_hi[None], zero)
                ey_hi = bdot(yw_hi, nay_ext)
                en_hi = bdot(nw_hi, yea_ext)
                out_blk = out_blk + 128.0 * (ey_hi[:, :, :P] + en_hi[:, :, :P])
                sums = sums + 128.0 * (ey_hi[:, :, P] + en_hi[:, :, P])
            O_ref[pl.ds(k0, KB)] = jnp.where(out_blk < gate, neg, out_blk)
            IN_ref[pl.ds(k0, KB), :] = -(w_sum - sums)
            return 0

        yea_from, nay_from = from_indicators(jnp.float32)
        yea_to = T1 > thiT  # pair (p, k0+i)
        nay_to = T1 < tloT
        yw_lo = jnp.where(yea_to, W_lo[None], zero)  # (KB, P, R)
        nw_lo = jnp.where(nay_to, W_lo[None], zero)
        out_blk = bdot(yw_lo, nay_from) + bdot(nw_lo, yea_from)  # (KB, P, P)
        sum_yw = jnp.sum(yw_lo, axis=2)  # (KB, P)
        sum_nw = jnp.sum(nw_lo, axis=2)
        if wide_weights:
            yw_hi = jnp.where(yea_to, W_hi[None], zero)
            nw_hi = jnp.where(nay_to, W_hi[None], zero)
            out_blk = out_blk + 128.0 * (bdot(yw_hi, nay_from) + bdot(nw_hi, yea_from))
            sum_yw = sum_yw + 128.0 * jnp.sum(yw_hi, axis=2)
            sum_nw = sum_nw + 128.0 * jnp.sum(nw_hi, axis=2)
        O_ref[pl.ds(k0, KB)] = jnp.where(out_blk < gate, neg, out_blk)
        IN_ref[pl.ds(k0, KB), :] = -(w_sum - sum_yw - sum_nw)
        return 0

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

    if blocked:
        jax.lax.fori_loop(0, P // KB, phase1_blocked, 0, unroll=False)
    else:
        jax.lax.fori_loop(0, P, phase1, 0, unroll=(P if unroll1 else False))
    if phases < 2:
        K_ref[0] = jnp.full((P, P), -1, dtype=jnp.int32)
        return

    # IN2[p, k] = inside(p, k) (transposed copy for sublane-dim reads).
    IN2_ref[...] = jnp.transpose(IN_ref[...])
    # OT[j][k, k_] = O[k][j, k_]: one bulk relayout so every phase-2 step
    # reads a CONTIGUOUS (1, P, P) plane instead of a strided gather
    # across the leading dim.
    OT_ref[...] = jnp.swapaxes(O_ref[...], 0, 1)

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

    # ---- phase 2: backward wavefront over j = P-2 .. 0, reading the
    # outside plane vals[k, k_] = outside(j, k, k_) from the transposed
    # copy OT[j]. UN j-steps run per loop iteration (the wavefront is
    # strictly sequential, but batching steps amortizes loop management);
    # the (P-1) % UN leftover steps run statically after the loop.
    def p2_step(j):
        O_plane = OT_ref[pl.ds(j, 1)][0]  # (P_k, P_k_)
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

    UN = un  # wavefront steps per loop iteration (sequencing amortization)
    n_loop = (P - 1) // UN

    def phase2(t, _):
        j0 = P - 2 - UN * t
        for i in range(UN):
            p2_step(j0 - i)
        return 0

    jax.lax.fori_loop(0, n_loop, phase2, 0,
                      unroll=(n_loop if unroll2 else False))
    for j in range((P - 1) % UN - 1, -1, -1):  # static remainder steps
        p2_step(j)
    if phases < 3:
        return

    # ---- phase 3: D0[j, k] = inside(0, j) + outside(0, j, k) + H[j, k].
    # outside(0, j, k) = O[j][0, k] = OT[0][j, k].
    O_plane0 = OT_ref[0]  # (P_j, P_k)
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


def _kernel_pipelined(n_ref, C_ref, y_prev_ref, W_ref, Thi_ref, Tlo_ref,
                      ThiT_ref, TloT_ref,
                      K_ref,
                      O_ref, OT_ref, IN_ref, INp_ref, IN2_ref, H_ref, SM_ref,
                      NE_ref, YE_ref,
                      P, R, scale, read_support, wide_weights,
                      kb_override=0, un=4):
    """Software-pipelined twin of _kernel (p1v=4 phase 1): grid step b runs
    problem b's phase 1 (MXU-heavy) STATICALLY INTERLEAVED with problem
    b-1's phase 2/3 (VPU-heavy wavefront), so the VLIW scheduler can
    overlap the two functional units instead of serializing ~35 ms of
    wavefront after ~120 ms of phase 1 (measured split at B=2048, P=64,
    R=512, tools/profile_kernel_phases.py). The grid has B+1 steps; step
    0's phase 2 consumes uninitialized scratch and its output block is
    discarded by the caller (K[0]), step B's phase 1 redundantly recomputes
    problem B-1 (outputs overwritten-never-read). Scratch carried across
    grid steps: O holds the PREVIOUS step's phase-1 output at step start
    (snapshotted into OT/INp before phase 1 overwrites it). Value-identical
    to the non-pipelined kernel: the phases compute byte-for-byte the same
    intermediates, only their schedule changes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    neg = jnp.float32(-jnp.inf)
    b = pl.program_id(0)
    n_prev = n_ref[jnp.maximum(b - 1, 0)]
    end = n_prev - 1

    W = W_ref[0]  # (1, R) f32, CURRENT problem (phase 1)
    y_prev = y_prev_ref[0]  # (1, P) int32, PREVIOUS problem (phase 2/3)

    # ---- previous-problem snapshots, before phase 1 overwrites O/IN.
    OT_ref[...] = jnp.swapaxes(O_ref[...], 0, 1)
    INp_ref[...] = IN_ref[...]
    IN2_ref[...] = jnp.transpose(INp_ref[...])
    SM_ref[...] = ((y_prev - jnp.transpose(y_prev)) < 5).astype(jnp.float32)

    w_sum = jnp.sum(W)
    gate = jnp.float32(read_support)
    W_int = W.astype(jnp.int32)
    W_lo = (W_int & 127).astype(jnp.float32)  # (1, R)
    W_hi = (W_int >> 7).astype(jnp.float32)

    KB = kb_override or _phase1_block(P, R, wide_weights, 4)
    NE_ref[:, pl.ds(P, 1), :] = jnp.ones((KB, 1, R), jnp.float32)
    YE_ref[:, pl.ds(P, 1), :] = jnp.ones((KB, 1, R), jnp.float32)

    def phase1_block(t):
        k0 = t * KB
        C_all = C_ref[0]  # (P, R) int32, pre-scaled
        C_blk = C_ref[0, pl.ds(k0, KB), :]  # (KB, R)
        T1 = C_blk[:, None, :] - C_all[None, :, :]  # (KB, P, R)
        thiT = ThiT_ref[0, pl.ds(k0, KB), :][:, :, None]
        tloT = TloT_ref[0, pl.ds(k0, KB), :][:, :, None]
        thi = Thi_ref[0, pl.ds(k0, KB), :][:, :, None]
        tlo = Tlo_ref[0, pl.ds(k0, KB), :][:, :, None]
        zero = jnp.float32(0.0)
        one = jnp.float32(1.0)

        def bdot(a, bb):
            return jax.lax.dot_general(
                a, bb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        yea_fb = jnp.where(T1 < -thi, one, zero)
        nay_fb = jnp.where(T1 > -tlo, one, zero)
        NE_ref[:, pl.ds(0, P), :] = nay_fb
        YE_ref[:, pl.ds(0, P), :] = yea_fb
        yea_to = T1 > thiT
        nay_to = T1 < tloT
        yw_lo = jnp.where(yea_to, W_lo[None], zero)
        nw_lo = jnp.where(nay_to, W_lo[None], zero)
        ey = bdot(yw_lo, NE_ref[...])  # (KB, P, P+1)
        en = bdot(nw_lo, YE_ref[...])
        out_blk = ey[:, :, :P] + en[:, :, :P]
        sums = ey[:, :, P] + en[:, :, P]
        if wide_weights:
            yw_hi = jnp.where(yea_to, W_hi[None], zero)
            nw_hi = jnp.where(nay_to, W_hi[None], zero)
            ey_hi = bdot(yw_hi, NE_ref[...])
            en_hi = bdot(nw_hi, YE_ref[...])
            out_blk = out_blk + 128.0 * (ey_hi[:, :, :P] + en_hi[:, :, :P])
            sums = sums + 128.0 * (ey_hi[:, :, P] + en_hi[:, :, P])
        O_ref[pl.ds(k0, KB)] = jnp.where(out_blk < gate, neg, out_blk)
        IN_ref[pl.ds(k0, KB), :] = -(w_sum - sums)

    # ---- phase 2/3 state for the PREVIOUS problem.
    small = SM_ref[...]
    kk_row = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    kk_col = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    in_end_row = INp_ref[pl.ds(end, 1), :]  # (1, P): inside(., end)
    H_ref[...] = jnp.where(
        (kk_row == end) & (kk_col < end), jnp.transpose(in_end_row), neg
    )
    K_ref[0] = jnp.full((P, P), -1, dtype=jnp.int32)
    kmask_static = (kk_row > kk_col) & (kk_row <= end) & (small == 0.0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    def p2_step(j):
        O_plane = OT_ref[pl.ds(j, 1)][0]
        vals = jnp.where(kmask_static, O_plane + H_ref[...], neg)
        row_max = jnp.max(vals, axis=1, keepdims=True)
        first_arg = jnp.min(
            jnp.where(vals == row_max, kk_row, jnp.int32(P)),
            axis=1, keepdims=True,
        )
        row_arg = jnp.transpose(first_arg)
        in_j = IN2_ref[pl.ds(j, 1), :]
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
        K_ref[0, pl.ds(j, 1), :] = jnp.where(valid_k, row_arg, -1)

    # ---- the interleave: STATIC unrolled schedule mixing phase-1 blocks
    # (current problem) among the wavefront groups (previous problem) --
    # one basic block, no conditionals, so the scheduler is free to issue
    # MXU dots and VPU wavefront ops concurrently.
    UN = un
    n_loop = (P - 1) // UN
    n_blocks = P // KB
    for t in range(n_loop):
        if t < n_blocks:
            phase1_block(t)
        j0 = P - 2 - UN * t
        for i in range(UN):
            p2_step(j0 - i)
    for t in range(n_loop, n_blocks):  # KB small enough that blocks fit
        phase1_block(t)
    for j in range((P - 1) % UN - 1, -1, -1):
        p2_step(j)

    # ---- phase 3 (previous problem).
    O_plane0 = OT_ref[0]
    in0 = jnp.transpose(IN2_ref[pl.ds(0, 1), :])
    small0 = SM_ref[pl.ds(0, 1), :]
    jmask = (
        (kk_col > 0) & (kk_col < end)
        & (kk_row > kk_col) & (kk_row <= end)
        & (jnp.transpose(small0) == 0.0)
        & (small == 0.0)
    )
    D0 = jnp.where(jmask, in0 + O_plane0 + H_ref[...], neg)
    best = jnp.max(D0)
    is_max = D0 == best
    big = jnp.int32(P)
    any_row = jnp.any(is_max, axis=1, keepdims=True)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    jm = jnp.min(jnp.where(any_row, row_iota, big))
    km = jnp.min(jnp.where(is_max & (kk_col == jm), kk_row, big))
    baseline = in_end_row[0, 0]
    ok = best > baseline
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    bj = jnp.where(ok, jm, -1)
    bk = jnp.where(ok, km, -1)
    K_ref[0, pl.ds(P - 1, 1), :] = jnp.where(
        lane == 0, bj, jnp.where(lane == 1, bk, -1)
    )


def solve_batch_pallas(C, y, W, n_cand, read_support, lookup, scale,
                       interpret=False, wide_weights=True, blocked=True,
                       unroll1=False, unroll2=False, phases=3,
                       kb_override=0, un=4, p1v=4, pipelined=False):
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

    if pipelined:
        # Software-pipelined schedule: B+1 grid steps; step b = phase 1 of
        # problem min(b, B-1) interleaved with phase 2/3 of problem b-1.
        # Output block 0 is garbage (no previous problem) and sliced off.
        KB = kb_override or _phase1_block(P, R, wide_weights, 4)
        kernel = functools.partial(
            _kernel_pipelined, P=P, R=R, scale=scale,
            read_support=read_support, wide_weights=wide_weights,
            kb_override=kb_override, un=un,
        )
        cur = lambda b, n: (jnp.minimum(b, B - 1), 0, 0)
        prev = lambda b, n: (jnp.maximum(b - 1, 0), 0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B + 1,),
            in_specs=[
                pl.BlockSpec((1, P, R), cur, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), prev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, R), cur, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, P), cur, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, P), cur, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, P), cur, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, P), cur, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, P, P), lambda b, n: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((P, P, P), jnp.float32),  # O (current phase 1)
                pltpu.VMEM((P, P, P), jnp.float32),  # OT (prev, snapshot)
                pltpu.VMEM((P, P), jnp.float32),  # IN (current)
                pltpu.VMEM((P, P), jnp.float32),  # INp (prev snapshot)
                pltpu.VMEM((P, P), jnp.float32),  # IN2 = transpose(INp)
                pltpu.VMEM((P, P), jnp.float32),  # H
                pltpu.VMEM((P, P), jnp.float32),  # small (prev)
                pltpu.VMEM((KB, P + 1, R), jnp.float32),  # NE
                pltpu.VMEM((KB, P + 1, R), jnp.float32),  # YE
            ],
        )
        (K_all,) = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((B + 1, P, P), jnp.int32),
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
        K = K_all[1:]
        return K, K[:, P - 1, 0], K[:, P - 1, 1]

    kernel = functools.partial(
        _kernel, P=P, R=R, scale=scale, read_support=read_support,
        wide_weights=wide_weights, blocked=blocked,
        unroll1=unroll1, unroll2=unroll2, phases=phases,
        kb_override=kb_override, un=un, p1v=p1v,
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
            pltpu.VMEM((P, P, P), jnp.float32),  # OT = swapaxes(O, 0, 1)
            pltpu.VMEM((P, P), jnp.float32),  # IN: IN[k, p] = inside(p, k)
            pltpu.VMEM((P, P), jnp.float32),  # IN2 = transpose(IN)
            pltpu.VMEM((P, P), jnp.float32),  # H
            pltpu.VMEM((P, P), jnp.float32),  # small
        ] + ([
            # p1v=4: pre-padded "from"-indicator planes (ones sublane at
            # row P written once; rows [0, P) refilled per block).
            pltpu.VMEM((kb_override or _phase1_block(P, R, wide_weights, 4),
                        P + 1, R), jnp.float32),
            pltpu.VMEM((kb_override or _phase1_block(P, R, wide_weights, 4),
                        P + 1, R), jnp.float32),
        ] if p1v == 4 else []),
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
