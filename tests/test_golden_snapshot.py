# SPDX-License-Identifier: CECILL-2.1
"""Committed golden-value snapshot: metric outputs for a fixed seed must not
drift across rounds (independent of the reference tree's availability).

Regenerate intentionally with:
    python tests/test_golden_snapshot.py --regen
"""
import json
import pathlib
import sys

import numpy as np
import pytest

SNAPSHOT = pathlib.Path(__file__).parent / "golden_snapshot.json"


def _compute_snapshot() -> dict:
    from barc4dip_tpu.metrics import sharpness_stats, speckle_stats
    from tests.conftest import make_speckle

    rng = np.random.default_rng(20260816)
    field = make_speckle(rng, shape=(384, 416), grain_px=6.0)

    sp = speckle_stats(field, metrics="all", tiles=True, verbose=False)
    sh = sharpness_stats(field, metrics="all", tiles=True, verbose=False)

    out = {"speckle_full": {}, "sharpness_full": {}, "speckle_tiles_mean": {}}
    for g, d in sp["full"].items():
        out["speckle_full"][g] = {
            k: float(v) for k, v in d.items() if np.isscalar(v) or np.ndim(v) == 0
        }
    for g, d in sh["full"].items():
        out["sharpness_full"][g] = {
            k: float(v) for k, v in d.items() if np.isscalar(v) or np.ndim(v) == 0
        }
    for g, fields in sp["tiles"].items():
        out["speckle_tiles_mean"][g] = {
            k: np.asarray(ms["mean"]).round(12).tolist() for k, ms in fields.items()
        }
    return out


def test_golden_snapshot():
    if not SNAPSHOT.exists():
        pytest.skip("no snapshot committed yet")
    want = json.loads(SNAPSHOT.read_text())
    got = _compute_snapshot()

    def walk(a, b, path=""):
        assert set(a) == set(b), f"{path}: key mismatch"
        for k in a:
            pa, pb = a[k], b[k]
            where = f"{path}.{k}"
            if isinstance(pa, dict):
                walk(pa, pb, where)
            elif isinstance(pa, list):
                np.testing.assert_allclose(
                    np.asarray(pb), np.asarray(pa), rtol=1e-9, atol=1e-12,
                    err_msg=where,
                )
            else:
                if np.isnan(pa):
                    assert np.isnan(pb), where
                else:
                    assert pb == pytest.approx(pa, rel=1e-9, abs=1e-12), where

    walk(want, got)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        SNAPSHOT.write_text(json.dumps(_compute_snapshot(), indent=1))
        print(f"wrote {SNAPSHOT}")
