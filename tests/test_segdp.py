"""Segmentation-DP equivalence tests.

A literal memoized-recursion oracle (mirroring the reference's recurrence at
py/freddie_segment.py:475-568, written independently) validates the
vectorized host solver; the batched device kernel is then checked against
the host solver on the same random instances, including mixed-size batches
with padding.
"""

import numpy as np
import pytest

from freddie_tpu.ops.segdp import DPProblem, solve_batch_device, solve_host
from freddie_tpu.ops.thresholds import ScaledThresholds


def literal_oracle(C, y, W, thr: ScaledThresholds, read_support: int):
    """Direct translation of the reference recurrence (float64, dicts)."""
    start, end = 0, len(y) - 1
    rate = thr.rate
    table = [v / thr.scale for v in thr.table_scaled.tolist()]

    def high(seg_len):
        return table[seg_len] if seg_len < len(table) else rate

    yea, nay, amb = {}, {}, {}
    for i in range(start, end):
        for j in range(i, end + 1):
            L = y[j] - y[i] + 1
            h = high(L)
            c = (C[j] - C[i]) / L
            yea[i, j] = c > h
            nay[i, j] = c < 1 - h
            amb[i, j] = W * np.logical_not(yea[i, j] | nay[i, j])

    def inside(i, j):
        return 0 if i == j else -amb[i, j].sum()

    def outside(i, j, k):
        if i == j or j == k:
            return 0
        v = (W * ((yea[i, j] & nay[j, k]) | (nay[i, j] & yea[j, k]))).sum()
        return float("-inf") if v < read_support else v

    D, B = {}, {}

    def dp(i, j, k):
        if (i, j, k) in D:
            return D[i, j, k]
        if y[j] - y[i] < 5 or y[k] - y[j] < 5:
            D[i, j, k], B[i, j, k] = float("-inf"), (-1, -1, -1)
        elif k == end:
            D[i, j, k] = inside(i, j) + outside(i, j, k) + inside(j, k)
            B[i, j, k] = (-1, -1, -1)
        else:
            best_d, best_b = float("-inf"), (-1, -1, -1)
            for k2 in range(k + 1, end + 1):
                d = inside(i, j) + outside(i, j, k) + dp(j, k, k2)
                if d > best_d:
                    best_d, best_b = d, (j, k, k2)
            D[i, j, k], B[i, j, k] = best_d, best_b
        return D[i, j, k]

    best_d = inside(start, end)
    best_b = (-1, -1, -1)
    for j in range(start + 1, end):
        for k in range(j + 1, end + 1):
            if dp(start, j, k) > best_d:
                best_b = (start, j, k)
                best_d = dp(start, j, k)
    out = set()
    b = best_b
    while b != (-1, -1, -1):
        out.update(b)
        b = B[b]
    return sorted(out)  # includes start/end when a segmentation was chosen


def random_problem(rng, P, R, span=2000):
    y = np.sort(rng.choice(np.arange(span), size=P, replace=False)).astype(np.int64)
    # Monotone cumulative coverage per rep with plateaus and jumps.
    inc = rng.integers(0, 12, size=(P, R))
    inc[rng.random(size=(P, R)) < 0.5] = 0
    C = np.cumsum(inc, axis=0).astype(np.int64)
    W = rng.integers(1, 5, size=R).astype(np.int64)
    return DPProblem(C=C, y=y, W=W, read_support=3)


@pytest.mark.parametrize("seed", range(6))
def test_host_matches_literal_oracle(seed):
    rng = np.random.default_rng(seed)
    thr = ScaledThresholds(0.9)
    P = int(rng.integers(3, 14))
    R = int(rng.integers(1, 9))
    pr = random_problem(rng, P, R)
    chain = solve_host(pr, thr)
    got = sorted(set(chain) | {0, P - 1}) if chain else []
    want = literal_oracle(pr.C, pr.y, pr.W, thr, pr.read_support)
    assert got == want


def test_device_matches_host_batched():
    rng = np.random.default_rng(42)
    thr = ScaledThresholds(0.9)
    problems = []
    for _ in range(17):
        P = int(rng.integers(2, 30))
        R = int(rng.integers(1, 40))
        problems.append(random_problem(rng, P, R))
    host = [solve_host(p, thr) for p in problems]
    dev = solve_batch_device(problems, thr)
    assert dev == host


def test_nay_equality_boundary():
    """A coverage ratio EXACTLY equal to 1-h must count as nay when the
    reference's float l = 1-h lands one ulp above the exact decimal
    (h=0.7 -> 1-0.7 = 0.30000000000000004), and the outside support sits
    exactly at read_support. Found by parity fuzzing (seed shift 47); the
    old strict integer comparison dropped this segmentation entirely."""
    thr = ScaledThresholds(0.9)
    # eq bit is per table entry: set for h=0.70 (seg_len 20), clear for
    # h=0.76 (seg_len 30) and for the 0.9 rate
    assert int(thr.nay_eq_scaled(np.array([20]))[0]) == 1
    assert int(thr.nay_eq_scaled(np.array([30]))[0]) == 0
    assert int(thr.nay_eq_scaled(np.array([200]))[0]) == 0
    y = np.array([0, 29, 48, 231], dtype=np.int64)
    # read 0: full on (0,1), ratio exactly 6/20 = 0.3 = 1-h on (1,2) ->
    # nay only via the equality bit; outside(0,1,2) is then exactly 3 = rs
    C = np.array([
        [0, 30, 36, 36],
        [0, 30, 30, 30],
        [0, 30, 30, 30],
        [0, 0, 0, 184],
        [0, 0, 0, 184],
        [0, 0, 0, 184],
    ], dtype=np.int64).T
    pr = DPProblem(C=C, y=y, W=np.ones(6, dtype=np.int64), read_support=3)
    want = literal_oracle(pr.C, pr.y, pr.W, thr, pr.read_support)
    assert want == [0, 1, 2, 3]  # the float-faithful oracle segments here
    chain = solve_host(pr, thr)
    assert sorted(set(chain) | {0, 3}) == want
    assert solve_batch_device([pr], thr) == [chain]


def test_degenerate_cases():
    thr = ScaledThresholds(0.9)
    # Too few candidates -> no segmentation.
    pr = DPProblem(
        C=np.zeros((2, 3), dtype=np.int64),
        y=np.array([0, 100], dtype=np.int64),
        W=np.ones(3, dtype=np.int64),
        read_support=3,
    )
    assert solve_host(pr, thr) == []
    assert solve_batch_device([pr], thr) == [[]]
    # All-small segments -> no segmentation possible.
    pr = DPProblem(
        C=np.tile(np.arange(5)[:, None], (1, 2)).astype(np.int64),
        y=np.array([0, 1, 2, 3, 4], dtype=np.int64),
        W=np.ones(2, dtype=np.int64),
        read_support=0,
    )
    assert solve_host(pr, thr) == []


@pytest.mark.parametrize("wide", [False, True])
def test_pallas_interpret_matches_xla(wide):
    """The Pallas kernel (interpret mode, CPU) must be bit-identical to the
    XLA kernel on the same padded batch: full backpointer tables for rows
    0..P-2 plus the top-level (best_j, best_k) pair. Guards kernel edits
    when no TPU is attached (the CPU suite otherwise never runs it)."""
    import jax.numpy as jnp

    from freddie_tpu.ops.segdp import _solve_batch_jax
    from freddie_tpu.ops.segdp_pallas import solve_batch_pallas

    rng = np.random.default_rng(7 if wide else 11)
    thr = ScaledThresholds(0.9)
    B, P, R = 4, 16, 128
    C = np.zeros((B, P, R), dtype=np.int32)
    y = np.zeros((B, P), dtype=np.int32)
    W = np.zeros((B, R), dtype=np.float32)
    n_cand = np.zeros((B,), dtype=np.int32)
    for b in range(B):
        p = int(rng.integers(6, P + 1))
        pr = random_problem(rng, p, R)
        C[b, :p] = pr.C
        C[b, p:] = pr.C[-1]
        y[b, :p] = pr.y
        y[b, p:] = pr.y[-1]
        W[b] = pr.W if not wide else pr.W * 97  # exercise the 7-bit split
        n_cand[b] = p
    lookup = jnp.asarray(thr.lookup)
    Kx, bjx, bkx = _solve_batch_jax(
        jnp.asarray(C), jnp.asarray(y), jnp.asarray(W), jnp.asarray(n_cand),
        3, lookup, thr.scale)
    Kp, bjp, bkp = solve_batch_pallas(
        jnp.asarray(C), jnp.asarray(y), jnp.asarray(W), jnp.asarray(n_cand),
        3, lookup, thr.scale, interpret=True, wide_weights=wide)
    np.testing.assert_array_equal(np.asarray(bjx), np.asarray(bjp))
    np.testing.assert_array_equal(np.asarray(bkx), np.asarray(bkp))
    np.testing.assert_array_equal(
        np.asarray(Kx)[:, : P - 1, :], np.asarray(Kp)[:, : P - 1, :])


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("variant", [3, 4])
def test_pallas_p1v_variants_bit_identical(wide, variant):
    """Phase-1 variants must match p1v=2 bit for bit. p1v=3 (bf16
    operands): every pair-tensor value is an integer 0..127 (exact in
    bf16) and the f32 MXU path rounds operands to bf16 anyway, so the
    products and their f32 accumulation (<= R*127 < 2^24 terms) are
    identical. p1v=4 (pre-padded scratch instead of concat): the scratch
    contents equal the concatenated tensors by construction."""
    import jax.numpy as jnp

    from freddie_tpu.ops.segdp_pallas import solve_batch_pallas

    rng = np.random.default_rng(13 if wide else 17)
    thr = ScaledThresholds(0.9)
    B, P, R = 4, 16, 128
    C = np.zeros((B, P, R), dtype=np.int32)
    y = np.zeros((B, P), dtype=np.int32)
    W = np.zeros((B, R), dtype=np.float32)
    n_cand = np.zeros((B,), dtype=np.int32)
    for b in range(B):
        p = int(rng.integers(6, P + 1))
        pr = random_problem(rng, p, R)
        C[b, :p] = pr.C
        C[b, p:] = pr.C[-1]
        y[b, :p] = pr.y
        y[b, p:] = pr.y[-1]
        W[b] = pr.W if not wide else pr.W * 97
        n_cand[b] = p
    lookup = jnp.asarray(thr.lookup)
    outs = []
    for v in (2, variant):
        outs.append(solve_batch_pallas(
            jnp.asarray(C), jnp.asarray(y), jnp.asarray(W),
            jnp.asarray(n_cand), 3, lookup, thr.scale, interpret=True,
            wide_weights=wide, p1v=v))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("wide", [False, True])
def test_pallas_pipelined_bit_identical(wide):
    """The software-pipelined kernel (grid step b = problem b's phase 1
    interleaved with problem b-1's phase 2/3, scratch carried across grid
    steps) must match the standard kernel bit for bit, including varied
    n_cand. Measured SLOWER on the axon chip (184.6 vs 158.7 ms at
    B=2048 under identical load, bit-identical backpointers) -- kept as
    the documented negative result for the split-phase kernel designs
    (BENCH_NOTES round-5 kernel section)."""
    import jax.numpy as jnp

    from freddie_tpu.ops.segdp_pallas import solve_batch_pallas

    rng = np.random.default_rng(23 if wide else 29)
    thr = ScaledThresholds(0.9)
    B, P, R = 5, 16, 128
    C = np.zeros((B, P, R), dtype=np.int32)
    y = np.zeros((B, P), dtype=np.int32)
    W = np.zeros((B, R), dtype=np.float32)
    n_cand = np.zeros((B,), dtype=np.int32)
    for b in range(B):
        p = int(rng.integers(6, P + 1))
        pr = random_problem(rng, p, R)
        C[b, :p] = pr.C
        C[b, p:] = pr.C[-1]
        y[b, :p] = pr.y
        y[b, p:] = pr.y[-1]
        W[b] = pr.W if not wide else pr.W * 97
        n_cand[b] = p
    lookup = jnp.asarray(thr.lookup)
    base = solve_batch_pallas(
        jnp.asarray(C), jnp.asarray(y), jnp.asarray(W), jnp.asarray(n_cand),
        3, lookup, thr.scale, interpret=True, wide_weights=wide)
    pipe = solve_batch_pallas(
        jnp.asarray(C), jnp.asarray(y), jnp.asarray(W), jnp.asarray(n_cand),
        3, lookup, thr.scale, interpret=True, wide_weights=wide,
        pipelined=True)
    for a, b in zip(base, pipe):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
