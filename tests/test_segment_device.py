"""Production device paths of the segment stage: the batched polyA
annotator and the multi-device sharded DP dispatch must both be used in
production and byte-match the host path."""

import filecmp
import os

import pytest

from freddie_tpu.config import SegmentConfig, SplitConfig
from freddie_tpu.stages.split import run_split
from freddie_tpu.utils.sim import simulate


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("segdev")
    sim = simulate(seed=31)
    bam, fq = str(d / "r.bam"), str(d / "r.fastq")
    sim.write_bam(bam)
    sim.write_fastq(fq)
    out = str(d / "split")
    run_split(bam, [fq], out, SplitConfig())
    return out


def _tsv_set(outdir):
    files = []
    for root, _dirs, fns in os.walk(outdir):
        for fn in sorted(fns):
            files.append(os.path.join(root, fn))
    return sorted(files)


def test_segment_polya_device_byte_identical(split_dir, tmp_path, monkeypatch):
    """Forcing the batched device polyA path produces TSVs byte-identical
    to the host annotator."""
    from freddie_tpu.stages import segment as seg

    host_out = str(tmp_path / "host")
    dev_out = str(tmp_path / "dev")
    monkeypatch.setattr(seg, "POLYA_DEVICE_MIN_READS", 10**9)
    seg.run_segment(split_dir, host_out, SegmentConfig())
    monkeypatch.setattr(seg, "POLYA_DEVICE_MIN_READS", 0)
    seg.run_segment(split_dir, dev_out, SegmentConfig())
    host_files = _tsv_set(host_out)
    dev_files = _tsv_set(dev_out)
    assert [os.path.relpath(f, host_out) for f in host_files] == [
        os.path.relpath(f, dev_out) for f in dev_files
    ]
    assert host_files
    for a, b in zip(host_files, dev_files):
        assert filecmp.cmp(a, b, shallow=False), os.path.relpath(a, host_out)


def test_solve_batch_device_uses_sharded_dispatch():
    """With >1 local device (conftest forces 8 virtual CPU devices),
    solve_batch_device routes through the loci-mesh sharded solver --
    including batch sizes that need mesh-multiple padding -- and matches
    the host oracle bit for bit."""
    import jax
    import numpy as np

    from freddie_tpu.ops.segdp import DPProblem, solve_batch_device, solve_host
    from freddie_tpu.ops.thresholds import ScaledThresholds
    from freddie_tpu.parallel import mesh as mesh_mod

    assert jax.local_device_count() > 1
    rng = np.random.default_rng(7)
    thr = ScaledThresholds(0.9)
    problems = []
    for _ in range(13):  # 13 % 8 != 0 -> exercises the pad-and-trim path
        P = int(rng.integers(5, 14))
        R = int(rng.integers(3, 30))
        y = np.sort(rng.choice(np.arange(1000), size=P, replace=False)).astype(np.int64)
        lens = np.diff(np.concatenate([[0], y]))
        C = np.cumsum(
            rng.integers(0, lens[:, None] + 1, size=(P, R)), axis=0
        ).astype(np.int64)
        problems.append(
            DPProblem(
                C=C,
                y=y,
                W=rng.integers(1, 5, size=R).astype(np.int64),
                read_support=3,
            )
        )
    mesh_mod._fn_cache.clear()
    got = solve_batch_device(problems, thr)
    assert mesh_mod._fn_cache, "sharded dispatch was not used"
    want = [solve_host(p, thr) for p in problems]
    assert got == want
