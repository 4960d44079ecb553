"""Cumulative coverage of read representatives over candidate segments.

Dense, vectorized equivalent of the reference's per-interval scatter +
prefix sum (py/freddie_segment.py:188-246): for candidate breakpoint
indices ``cands`` (y-space, sorted, within one tint interval),

    C[c, r] = number of bases of read-rep r lying before candidate c
              (counting each aligned interval inclusively on both ends),

so C[j] - C[i] is the coverage of rep r strictly between candidates i and
j. Shapes are (n_cands + 1, n_reps) like the reference; row 0 is the
coverage before the first candidate.
"""

from __future__ import annotations

import numpy as np


def cumulative_coverage(
    starts: np.ndarray,  # (n_iv,) read-rep interval starts, y-space
    ends: np.ndarray,  # (n_iv,) read-rep interval ends, y-space (inclusive span s..e)
    reps: np.ndarray,  # (n_iv,) read-rep index of each interval
    n_reps: int,
    cands: np.ndarray,  # (P,) sorted candidate y indices
    validate: bool = False,
) -> np.ndarray:
    P = len(cands)
    C = np.zeros((P + 1, n_reps), dtype=np.int64)
    if len(starts) == 0:
        return C
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    reps = np.asarray(reps, dtype=np.int64)
    cands = np.asarray(cands, dtype=np.int64)

    s_idx = np.searchsorted(cands, starts, side="right")
    e_idx = np.searchsorted(cands, ends, side="right")
    same = s_idx == e_idx

    # Intervals fully inside one candidate segment: whole inclusive length.
    np.add.at(C, (s_idx[same], reps[same]), ends[same] - starts[same] + 1)

    # Intervals spanning >= 2 candidate segments: head + tail pieces.
    m = ~same
    head = cands[s_idx[m]] - starts[m]
    tail = ends[m] - cands[e_idx[m] - 1] + 1
    if validate:
        assert np.all(head > 0) and np.all(tail > 0)
    np.add.at(C, (s_idx[m], reps[m]), head)
    np.add.at(C, (e_idx[m], reps[m]), tail)

    # Full middle segments: candidate gaps times the span count, built with a
    # difference array over rows.
    span = np.zeros((P + 1, n_reps), dtype=np.int64)
    np.add.at(span, (s_idx[m] + 1, reps[m]), 1)
    np.add.at(span, (e_idx[m], reps[m]), -1)
    span = np.cumsum(span, axis=0)
    gaps = np.zeros(P + 1, dtype=np.int64)
    gaps[1:P] = cands[1:] - cands[:-1]
    C += span * gaps[:, None]

    if validate:
        total = int((ends - starts + 1).sum())
        assert C.sum() == total, (C.sum(), total)
    np.cumsum(C, axis=0, out=C)
    return C
