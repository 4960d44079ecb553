"""Consolidated native round solver (native/round_solver.cpp) vs the
rung-by-rung Python chain: bit-identical results on every escalation
outcome the consolidated call covers (phase-1 OPTIMAL, BUDGET -> closure
OPTIMAL, BUDGET -> closure declined -> later rungs)."""

import numpy as np
import pytest

import freddie_tpu.solver.native as native_mod
import freddie_tpu.solver.segenum as segenum_mod
import freddie_tpu.solver.two_phase as tp
from freddie_tpu.solver.native import native_available, solve_round_native
from tests.test_solver import random_instance

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


def attach_flat(inst):
    """Fill the flat-array form the way stages/cluster.build_instance
    does (the test generator's gap masks are contiguous ranges)."""
    rows = inst.rows
    N = len(rows)
    Mi = len(inst.seg_len)
    inst.exons_mat = np.stack([r.exons for r in rows]) if N else np.zeros((0, Mi), bool)
    inst.corr_mat = np.stack([r.corr for r in rows]) if N else np.zeros((0, Mi), bool)
    inst.garbage_arr = np.array([r.garbage for r in rows], dtype=np.float64)
    counts, los, his, lens = [], [], [], []
    for r in rows:
        counts.append(len(r.gaps))
        for mask, l in r.gaps:
            nz = np.flatnonzero(mask)
            lo, hi = (int(nz[0]), int(nz[-1]) + 1) if len(nz) else (0, 0)
            assert np.array_equal(
                np.flatnonzero(mask), np.arange(lo, hi)
            ), "generator gap masks must be contiguous ranges"
            los.append(lo)
            his.append(hi)
            lens.append(int(l))
    inst.gap_counts = np.array(counts, dtype=np.int32)
    inst.gap_lo = np.array(los, dtype=np.int32)
    inst.gap_hi = np.array(his, dtype=np.int32)
    inst.gap_len_arr = np.array(lens, dtype=np.int64)
    return inst


def solve_python_chain(inst, deadline_s=60.0, monkeypatch=None):
    """solve_two_phase with the consolidated native entry disabled, so the
    original rung-by-rung chain runs (phase-1 via the C++/Python twins,
    closure via solve_segment_enum_closure, etc.)."""
    import unittest.mock as mock

    with mock.patch.object(native_mod, "solve_round_native", lambda *a, **k: None):
        return tp.solve_two_phase(inst, deadline_s)


def assert_same(a, b):
    assert a.status == b.status
    assert a.objective == b.objective
    assert a.assigned == b.assigned
    if a.isoform is None or b.isoform is None:
        assert (a.isoform is None) == (b.isoform is None)
    else:
        assert np.array_equal(np.asarray(a.isoform), np.asarray(b.isoform))


@pytest.mark.parametrize("seed", range(20))
def test_round_native_matches_chain(seed):
    rng = np.random.default_rng(seed + 5100)
    N = int(rng.integers(2, 40))
    M = int(rng.integers(1, 14))
    inst = attach_flat(random_instance(rng, N, M))
    got = tp.solve_two_phase(inst, 60.0)
    want = solve_python_chain(inst, 60.0)
    assert got.status == "OPTIMAL"
    assert_same(got, want)


@pytest.mark.parametrize("seed", range(12))
def test_round_native_matches_chain_under_budget(seed, monkeypatch):
    # Tiny node budget forces the BUDGET -> closure escalation in both
    # engines; results (and the phase-1 incumbent filter effects) must
    # stay bit-equal.
    monkeypatch.setattr(tp, "NODE_BUDGET", 5)
    rng = np.random.default_rng(seed + 5200)
    N = int(rng.integers(6, 40))
    M = int(rng.integers(2, 14))
    inst = attach_flat(random_instance(rng, N, M))
    got = tp.solve_two_phase(inst, 60.0)
    want = solve_python_chain(inst, 60.0)
    assert_same(got, want)
    # nodes field may differ between engines only in the closure case
    # (Python reports the closure's 0); statuses must agree.
    assert got.status == "OPTIMAL"


@pytest.mark.parametrize("seed", range(8))
def test_round_native_closure_declined(seed, monkeypatch):
    # Closure cap of 1 forces the decline -> 1b/1c/LP/full continuation
    # with the returned incumbent; both engines must land on the same
    # canonical answer.
    monkeypatch.setattr(tp, "NODE_BUDGET", 5)
    monkeypatch.setattr(segenum_mod, "CLOSURE_CAP", 1)
    rng = np.random.default_rng(seed + 5300)
    N = int(rng.integers(6, 30))
    M = int(rng.integers(2, 12))
    inst = attach_flat(random_instance(rng, N, M))
    kind_res = solve_round_native(inst, 60.0, 5)
    assert kind_res is not None
    got = tp.solve_two_phase(inst, 60.0)
    want = solve_python_chain(inst, 60.0)
    assert_same(got, want)


@pytest.mark.parametrize("seed", range(10))
def test_round_native_matches_chain_wide_mi(seed, monkeypatch):
    """64 < Mi <= 128 (the two-word closure): the consolidated native
    call (u128 closure + enum) and the pure-Python chain (word-array
    _PerStructure + Python-int closure) must stay bit-identical across
    whatever escalation the content picks (closure OPTIMAL, closure
    declined -> LP/full, ...)."""
    monkeypatch.setattr(tp, "NODE_BUDGET", 5)  # force past phase 1
    rng = np.random.default_rng(seed + 5400)
    N = int(rng.integers(6, 32))
    M = int(rng.integers(65, 129))
    inst = attach_flat(random_instance(rng, N, M))
    got = tp.solve_two_phase(inst, 60.0)
    want = solve_python_chain(inst, 60.0)
    assert got.status == "OPTIMAL"
    assert_same(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_wide_mi_closure_objective_is_optimal(seed, monkeypatch):
    """The two-word closure's objective equals the unbudgeted exact
    read-DFS optimum (engines may tie-break differently among equally
    optimal solutions; the objective is the optimality witness)."""
    from freddie_tpu.solver.exact import solve_exact

    monkeypatch.setattr(tp, "NODE_BUDGET", 5)
    rng = np.random.default_rng(seed + 5500)
    N = int(rng.integers(4, 16))
    M = int(rng.integers(65, 129))
    inst = attach_flat(random_instance(rng, N, M))
    got = tp.solve_two_phase(inst, 60.0)
    full = solve_exact(inst, 120.0)
    assert got.status == full.status == "OPTIMAL"
    assert got.objective == full.objective


def test_round_native_empty_instance():
    rng = np.random.default_rng(0)
    inst = attach_flat(random_instance(rng, 2, 3))
    inst.rows = []
    inst.exons_mat = np.zeros((0, 3), dtype=bool)
    inst.corr_mat = np.zeros((0, 3), dtype=bool)
    inst.garbage_arr = np.zeros(0, dtype=np.float64)
    inst.gap_counts = np.zeros(0, dtype=np.int32)
    inst.gap_lo = np.zeros(0, dtype=np.int32)
    inst.gap_hi = np.zeros(0, dtype=np.int32)
    inst.gap_len_arr = np.zeros(0, dtype=np.int64)
    inst.incomp = []
    kind, res = solve_round_native(inst, 60.0, 100)
    assert kind == "final" and res.status == "OPTIMAL" and res.objective == 0.0


def test_device_bounds_match_host_and_gate_roundtrip(monkeypatch):
    """The batched matmul bound evaluation must be bit-equal to the host
    loop, and the closure_device escalation (C++ defers, Python re-runs
    the closure with device bounds) must return exactly what the
    all-native path returns."""
    import freddie_tpu.solver.segenum as se
    from freddie_tpu.solver.segenum import (
        _PerStructure,
        _optimistic_masks_device,
    )

    rng = np.random.default_rng(4242)
    for _ in range(10):
        N = int(rng.integers(2, 60))
        M = int(rng.integers(2, 14))
        inst = attach_flat(random_instance(rng, N, M))
        ctx = _PerStructure(inst)
        masks = np.unique(
            rng.integers(0, 1 << M, size=200).astype(np.uint64)
        )
        want = ctx.optimistic_block(masks)
        got = _optimistic_masks_device(ctx, masks)
        assert np.array_equal(got, want)

    # Round-trip: force the gate to 1 so every escalating instance takes
    # the closure_device path; results must equal the ungated solve.
    monkeypatch.setattr(tp, "NODE_BUDGET", 5)
    for seed in range(6):
        rng = np.random.default_rng(seed + 6400)
        inst = attach_flat(random_instance(rng, int(rng.integers(6, 30)),
                                           int(rng.integers(2, 12))))
        want = tp.solve_two_phase(inst, 60.0)
        monkeypatch.setattr(se, "BOUNDS_DEVICE_MIN", 1)
        got = tp.solve_two_phase(inst, 60.0)
        monkeypatch.setattr(se, "BOUNDS_DEVICE_MIN", 20_000_000)
        assert_same(got, want)
