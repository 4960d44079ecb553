"""Length-adaptive coverage thresholds, in exact integer arithmetic.

The reference tabulates a logistic ramp of the high threshold by segment
length (py/freddie_segment.py:277-286, values rounded to 2 decimals) and
compares coverage ratios against it in float64:

    c = (C[j] - C[i]) / seg_len            # rational with small denominator
    yea = c > h ;  nay = c < 1 - h         # h = table[seg_len] or rate

Because h is an exact multiple of 1/SCALE and the ratio c is a rational
whose denominator is bounded by the segment length, the float comparisons
are *exactly* equivalent to the integer comparisons

    SCALE*(C[j]-C[i]) > h_scaled * seg_len
    SCALE*(C[j]-C[i]) < (SCALE - h_scaled) * seg_len

(the nearest rationals to h with such denominators are farther from h than
any rounding error of the float64 division). We therefore carry thresholds
as integers, which makes the decision bit-identical across float32 TPU
kernels, float64 host math, and the reference.
"""

from __future__ import annotations

from math import exp

import numpy as np


def smooth_threshold_table(threshold: float) -> list[float]:
    """The reference's logistic threshold ramp (py/freddie_segment.py:277-286).

    Entry x is the high threshold for a segment of length x, rounded to two
    decimals; the table stops once x*(threshold - y) < 0.5 (and x > 5)."""
    vals: list[float] = []
    while True:
        x = len(vals)
        y = threshold / (1 + ((threshold - 0.5) / 0.5) * exp(-0.05 * x))
        if x > 5 and x * (threshold - y) < 0.5:
            break
        vals.append(round(y, 2))
        assert len(vals) < 1000
    return vals


class ScaledThresholds:
    """Integer-scaled threshold lookup.

    ``table_scaled[L]`` is the high threshold (times SCALE) for segment
    length L < len(table); longer segments use ``rate_scaled``.
    """

    def __init__(self, threshold_rate: float):
        self.rate = threshold_rate
        table = smooth_threshold_table(threshold_rate)
        # Table entries are exact multiples of 1/100 by construction.
        # The rate itself usually is too (default 0.9); find a scale that
        # represents both exactly.
        for scale in (100, 1000, 10_000, 100_000):
            r = threshold_rate * scale
            if abs(r - round(r)) < 1e-6:
                self.scale = scale
                break
        else:
            raise ValueError(
                f"threshold_rate={threshold_rate} is not an exact decimal; "
                "use at most 5 decimal places"
            )
        self.rate_scaled = int(round(threshold_rate * self.scale))
        self.table_scaled = np.array(
            [int(round(v * self.scale)) for v in table], dtype=np.int64
        )
        # Lookup array with the rate appended as the "beyond table" entry:
        # index with min(seg_len, len(table)).
        self.lookup = np.concatenate(
            [self.table_scaled, [self.rate_scaled]]
        ).astype(np.int32)

    def high_scaled(self, seg_len: np.ndarray) -> np.ndarray:
        """Vectorized high threshold (times SCALE) by segment length."""
        idx = np.minimum(seg_len, len(self.table_scaled))
        return self.lookup[idx]
