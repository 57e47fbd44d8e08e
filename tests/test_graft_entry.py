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


def test_dryrun_multichip_parity_asserts():
    # conftest provisions 8 virtual CPU devices; the dryrun itself
    # verifies n-device == 1-device output parity across every leaf
    graft.dryrun_multichip(8)
