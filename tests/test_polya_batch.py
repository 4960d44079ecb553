"""Batched polyA scorer vs the host implementation, window by window."""

import numpy as np

from freddie_tpu.ops.polya import longest_poly_runs
from freddie_tpu.ops.polya_batch import best_poly_batch


def host_best(window: str, char: str):
    cands = []
    for f, l, p in longest_poly_runs(window, 0, len(window), 1, char):
        if l < 20 or p < 0.85:
            continue
        cands.append((f, l, p))
    if not cands:
        return None
    best = max(cands, key=lambda t: t[2])  # first-wins ties (list order)
    f, l, p = best
    return (f, l, round(p * l))


def random_window(rng, n, polya_prob):
    chars = []
    i = 0
    while i < n:
        if rng.random() < polya_prob:
            run = int(rng.integers(15, 60))
            for _ in range(run):
                chars.append("A" if rng.random() > 0.1 else rng.choice(list("CGT")))
            i += run
        else:
            chars.append(rng.choice(list("ACGT")))
            i += 1
    return "".join(chars[:n])


def test_matches_host_random():
    rng = np.random.default_rng(0)
    windows, chars = [], []
    for _ in range(60):
        n = int(rng.integers(0, 400))
        windows.append(random_window(rng, n, polya_prob=0.15))
        chars.append(rng.choice(["A", "T"]))
    got = best_poly_batch(windows, chars)
    want = [host_best(w, c) for w, c in zip(windows, chars)]
    assert got == want


def test_edge_cases():
    # pure polyA, exactly-threshold purity, too-short runs
    windows = [
        "A" * 30,                     # perfect run
        "A" * 17 + "C" + "A" * 2,     # 20 long, purity 19/20 = 0.95
        "A" * 19,                     # too short
        "",                           # empty
        "C" * 100,                    # no run
        ("A" * 20 + "C" * 5) * 4,     # multiple runs
    ]
    chars = ["A"] * len(windows)
    got = best_poly_batch(windows, chars)
    want = [host_best(w, c) for w, c in zip(windows, chars)]
    assert got == want


def test_long_window_fallback():
    rng = np.random.default_rng(5)
    w = random_window(rng, 3000, polya_prob=0.1)
    got = best_poly_batch([w], ["A"])
    assert got == [host_best(w, "A")]
