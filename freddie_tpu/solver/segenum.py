"""Exact solver by enumeration over isoform structures (small instances).

When the number of informative segments Mi is small, the isoform search
space (2^Mi exon bitmasks) is far smaller than the read-subset space the
branch-and-bound walks: many real instances have ~100 reads but <=20
informative segments, which makes the read-DFS explode (near-duplicate
rows under dense incompatibility constraints) while the structure space
is trivially enumerable.

For every candidate structure E (ascending optimistic cost, then mask):
  - assignable reads: I_i a subset of E (anything else would grow the
    union) with all gap windows feasible at G(E);
  - per-read profit delta_i = garbage_i - corrections_i(E); the optimal
    assignment maximizes total profit subject to (a) incompatible pairs
    not both chosen and (b) every segment of E covered by some chosen
    read (the ILP's E2I = max equality);
  - the residual per-E subproblem (max-weight conflict-free cover) is
    solved by a tiny DFS over the assignable reads.

Dispatch between the C++ core (native/segenum.cpp) and this Python
implementation depends ONLY on library availability, never on instance
content: both twins accept exactly Mi <= MAX_SEGS and visit structures in
the same order with the same tie-breaks, so a missing toolchain changes
speed, never results (bit-equality: tests/test_segenum_native.py).
Neither twin materializes an (N, 2^Mi) table -- per-structure candidate
sets are computed on demand -- so memory is O(N + 2^Mi) at any Mi.
The returned optimum is canonical (documented in PARITY.md) and its
objective always equals the read-DFS optimum -- both solve the same ILP.
"""

from __future__ import annotations

import numpy as np

from .exact import ClusterInstance, SolveResult

MAX_SEGS = 20  # both twins: 2^20 masks enumerated at most

# popcount of every 16-bit value; popcount(u32 x) = _PC16[x&0xFFFF] + _PC16[x>>16]
_PC16 = np.array(
    [bin(v).count("1") for v in range(1 << 16)], dtype=np.int32
)


def solve_segment_enum(inst: ClusterInstance, deadline_s: float = 60.0) -> SolveResult | None:
    """Exact solve via structure enumeration; None iff Mi > MAX_SEGS.

    The decline decision is purely instance content (Mi), identical for
    both engines; the C++ core is preferred for speed, with this Python
    implementation as the bit-equal reference definition and fallback."""
    if len(inst.seg_len) > MAX_SEGS:
        return None
    from .native import solve_segenum_native

    native = solve_segenum_native(inst, deadline_s)
    if native is not None:
        return native
    return _solve_segment_enum_py(inst, deadline_s)


def _popcount_u32(x: np.ndarray) -> np.ndarray:
    return _PC16[x & np.uint32(0xFFFF)] + _PC16[x >> np.uint32(16)]


def _solve_segment_enum_py(inst: ClusterInstance, deadline_s: float = 60.0) -> SolveResult | None:
    """Pure-Python structure enumeration (the canonical definition)."""
    import time

    Mi = len(inst.seg_len)
    N = len(inst.rows)
    if Mi > MAX_SEGS:
        return None
    if N == 0:
        return SolveResult("OPTIMAL", 0.0, [], None)
    t_end = time.monotonic() + deadline_s

    n_masks = 1 << Mi
    bit = 1 << np.arange(Mi, dtype=np.uint32)
    I_int = np.array(
        [int((np.asarray(r.exons, bool) * bit).sum()) for r in inst.rows],
        dtype=np.uint32,
    )
    C_int = np.array(
        [int((np.asarray(r.corr, bool) * bit).sum()) for r in inst.rows],
        dtype=np.uint32,
    )
    g = np.array([r.garbage for r in inst.rows], dtype=np.float64)
    g_total = float(g.sum())

    # Flat per-gap arrays for on-demand feasibility at each E.
    sc, eps, off = inst.eps_scale, inst.eps_scaled, inst.offset
    seg_len = inst.seg_len.astype(np.int64)
    gap_read: list[int] = []
    gap_mask_l: list[int] = []
    gap_len_l: list[int] = []
    for i, r in enumerate(inst.rows):
        for mask, l in r.gaps:
            gap_read.append(i)
            gap_mask_l.append(int((np.asarray(mask, bool) * bit).sum()))
            gap_len_l.append(int(l))
    gap_read_a = np.array(gap_read, dtype=np.int64)
    gap_masks = np.array(gap_mask_l, dtype=np.uint32)
    gap_lens = np.array(gap_len_l, dtype=np.int64)
    n_gaps = len(gap_read)

    # Optimistic cost per E: all positive-profit subset-compatible reads
    # assigned, ignoring gap windows, conflicts and coverage -- a valid
    # lower bound per structure (dropping the gap filter only loosens it).
    # Computed blockwise so no (N, 2^Mi) table is ever resident.
    optimistic = np.empty(n_masks, dtype=np.float64)
    block = 1 << 12
    for lo in range(0, n_masks, block):
        E_blk = np.arange(lo, min(lo + block, n_masks), dtype=np.uint32)
        subset_ok = (I_int[:, None] & ~E_blk[None, :]) == 0  # (N, B)
        corr_pc = _popcount_u32(C_int[:, None] & E_blk[None, :])  # (N, B)
        d = g[:, None] - corr_pc
        pos_gain = np.where(subset_ok & (d > 0), d, 0.0).sum(axis=0)
        optimistic[lo : lo + len(E_blk)] = g_total - pos_gain

    conflict_mat = np.zeros((N, N), dtype=bool)
    for a, b2 in inst.incomp:
        conflict_mat[a, b2] = True
        conflict_mat[b2, a] = True
    any_conflict = conflict_mat.any()

    best_cost = g_total  # E = 0, S = empty
    best_E = 0
    best_S: list[int] = []

    # Deterministic visit order: most promising first, ties by mask value.
    E_all = np.arange(n_masks, dtype=np.uint32)
    order = np.lexsort((E_all, optimistic))
    timed_out = False

    for E in order:
        E = int(E)
        if optimistic[E] >= best_cost:
            # visit order is ascending in optimistic cost: no later E can
            # strictly improve on the incumbent.
            break
        if time.monotonic() > t_end:
            timed_out = True
            break
        # On-demand candidate set for this E (mirrors the C++ per-E scan).
        ok = (I_int & ~np.uint32(E)) == 0  # subset-compatible
        if n_gaps:
            gm = gap_masks & np.uint32(E)
            G = np.zeros(n_gaps, dtype=np.int64)
            for b in range(Mi):
                if (E >> b) & 1:
                    G += ((gm >> np.uint32(b)) & 1).astype(np.int64) * seg_len[b]
            gok = ((sc - eps) * G <= sc * (gap_lens + off)) & (
                sc * (gap_lens - off) <= (sc + eps) * G
            )
            if not gok.all():
                bad = np.bincount(gap_read_a[~gok], minlength=N) > 0
                ok &= ~bad
        cand = np.flatnonzero(ok)
        if E and not len(cand):
            continue
        # coverage requirement: union of chosen I must equal E
        d = g[cand] - _popcount_u32(C_int[cand] & np.uint32(E))
        # order candidates by descending profit, then index (deterministic)
        perm = np.lexsort((cand, -d))
        sub_order = cand[perm]
        sub_delta_all = d[perm]
        if any_conflict and len(sub_order):
            conf_sub = conflict_mat[np.ix_(sub_order, sub_order)]
            has_conf = conf_sub.any(axis=1)
        else:
            conf_sub = None
            has_conf = np.zeros(len(sub_order), dtype=bool)
        # Candidates with no conflicts inside this E's candidate set and
        # non-negative profit are always in the (first-found) optimum:
        # assigning them cannot hurt coverage, profit, or anybody else.
        free = ~has_conf & (sub_delta_all >= 0)
        base_gain = float(sub_delta_all[free].sum())
        base_union = 0
        for v in I_int[sub_order[free]]:
            base_union |= int(v)
        rest = np.flatnonzero(~free)
        rest_order = sub_order[rest]
        sub_delta = sub_delta_all[rest].tolist()
        sub_I = [int(v) for v in I_int[rest_order]]
        n_sub = len(rest_order)
        if conf_sub is not None and n_sub:
            conf_rest = conf_sub[np.ix_(rest, rest)]
            sub_conf = [frozenset(np.flatnonzero(row)) for row in conf_rest]
        else:
            empty = frozenset()
            sub_conf = [empty] * n_sub
        # suffix positive-profit sums for pruning; suffix unions for coverage
        suff_pos = [0.0] * (n_sub + 1)
        suff_union = [0] * (n_sub + 1)
        for p in range(n_sub - 1, -1, -1):
            suff_pos[p] = suff_pos[p + 1] + max(sub_delta[p], 0.0)
            suff_union[p] = suff_union[p + 1] | sub_I[p]

        best_gain = -np.inf
        best_sub: list[int] | None = None
        chosen: list[int] = []

        def rec(p: int, gain: float, union: int, chosen_set: set):
            nonlocal best_gain, best_sub
            # prune: remaining reads cannot complete the coverage of E
            if (union | suff_union[p]) & E != E:
                return
            if gain + suff_pos[p] <= best_gain:
                return
            if p == n_sub:
                if union == E and gain > best_gain:
                    best_gain = gain
                    best_sub = list(chosen)
                return
            # assign p if conflict-free
            if not (sub_conf[p] & chosen_set):
                chosen.append(p)
                chosen_set.add(p)
                rec(p + 1, gain + sub_delta[p], union | sub_I[p], chosen_set)
                chosen_set.remove(p)
                chosen.pop()
            rec(p + 1, gain, union, chosen_set)

        # E == 0 is NOT special: reads with no exons can profitably join
        # an empty-structure isoform (union stays 0 == E).
        rec(0, base_gain, base_union, set())
        if best_sub is None:
            continue
        cost = g_total - best_gain
        if cost < best_cost:
            best_cost = cost
            best_E = E
            best_S = sorted(
                [int(rest_order[p]) for p in best_sub]
                + [int(v) for v in sub_order[free]]
            )

    if timed_out:
        return SolveResult("TIMEOUT", best_cost, [], None, 0)
    iso = np.array([(best_E >> b) & 1 for b in range(Mi)], dtype=bool)
    return SolveResult("OPTIMAL", best_cost, best_S, iso, 0)
