"""Precision presets: the measured χ=1024 accuracy/throughput rungs
(round-5 matrix, BASELINE.md) as one-call configurations."""

import pytest

from pytdscf_tpu.config import Config


def test_presets_fields():
    base = Config(jobname="p")
    t = base.with_precision_preset("throughput")
    assert (t.matvec_precision, t.env_precision) == ("high", "high")
    assert t.krylov_relaxed and t.relax_after == 1 and t.pallas_matvec
    b = base.with_precision_preset("balanced")
    assert (b.matvec_precision, b.env_precision) == ("highest", "highest")
    assert b.krylov_relaxed and b.relax_after == 1
    p = base.with_precision_preset("precise")
    assert p.krylov_relaxed and p.relax_after == 2
    assert (p.matvec_precision, p.env_precision) == ("highest", "highest")
    e = base.with_precision_preset("exact")
    assert not e.krylov_relaxed and not e.pallas_matvec
    assert (e.matvec_precision, e.env_precision) == ("highest", "highest")
    # presets do not touch unrelated fields
    assert t.jobname == "p" and t.dtype == base.dtype


def test_preset_unknown():
    with pytest.raises(ValueError):
        Config(jobname="p").with_precision_preset("fast")
