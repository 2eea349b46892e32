"""Checkpoint roundtrips (pickle and orbax backends)."""

import numpy as np
import pytest

from pytdscf_tpu.checkpoint import (
    load_wavefunction,
    resolve_checkpoint,
    save_wavefunction,
)


def _payload():
    rng = np.random.default_rng(0)
    return {
        "cores": [
            [
                (rng.normal(size=(1, 4, 2)) + 1j * rng.normal(size=(1, 4, 2))),
                (rng.normal(size=(2, 4, 1)) + 1j * rng.normal(size=(2, 4, 1))),
            ]
        ]
    }


def test_pickle_roundtrip(tmp_path):
    path = str(tmp_path / "wf_test.pkl")
    payload = _payload()
    out = save_wavefunction(payload, path, backend="pickle")
    assert out == path
    back = load_wavefunction(resolve_checkpoint(path))
    np.testing.assert_allclose(back["cores"][0][0], payload["cores"][0][0])


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = str(tmp_path / "wf_test.pkl")
    payload = _payload()
    out = save_wavefunction(payload, path, backend="orbax")
    assert out.endswith(".ckpt")
    back = load_wavefunction(out)
    np.testing.assert_allclose(
        np.asarray(back["cores"][0][1]), payload["cores"][0][1]
    )
    # resolve finds the orbax checkpoint from the pickle-style base name
    assert resolve_checkpoint(path) == out
