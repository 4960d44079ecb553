"""Native C++ BAM decoder vs the pure-Python reader: identical records."""

import pytest

from freddie_tpu.io.bam import BamReader
from freddie_tpu.io.bam_native import NativeBamReader, native_bam_available
from freddie_tpu.utils.sim import simulate

pytestmark = pytest.mark.skipif(
    not native_bam_available(), reason="no C++ toolchain available"
)


def test_native_matches_python(tmp_path):
    sim = simulate(seed=8, n_genes=2, isoforms_per_gene=2, reads_per_isoform=7,
                   minus_strand_genes=True, truncate_prob=0.2)
    bam = str(tmp_path / "t.bam")
    sim.write_bam(bam)
    with BamReader(bam) as r:
        py = list(r)
        refs_py = (r.references, r.lengths)
    with NativeBamReader(bam) as r:
        nat = list(r)
        refs_nat = (r.references, r.lengths)
    assert refs_py == refs_nat
    assert len(py) == len(nat) == len(sim.reads)
    for a, b in zip(py, nat):
        assert a.query_name == b.query_name
        assert a.flag == b.flag
        assert a.reference_start == b.reference_start
        assert a.cigartuples == b.cigartuples
        assert a.query_sequence == b.query_sequence
        assert a.reference_name == b.reference_name
        assert a.mapq == b.mapq


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.bam"
    bad.write_bytes(b"not a bam file at all")
    with pytest.raises(ValueError):
        NativeBamReader(str(bad))
