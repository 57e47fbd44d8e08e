# SPDX-License-Identifier: CECILL-2.1
"""In-process alternating A/B of the fused NCC kernel: f32 vs bf16 planes.

Times ncc_masked_peaks_from_spectra at the production tracker shape
(18-template bank, 2048^2) with both storage dtypes, interleaved reps so
backend congestion hits both arms equally. Run on the real chip.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_stack


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[-1]).ravel()[:1]
    jax.block_until_ready(out)


def main():
    from barc4dip_tpu.ops import mxufft, ncc, pallas_fftp

    side = int(os.environ.get("SIDE", 2048))
    nb = int(os.environ.get("BANK", 18))
    s = int(os.environ.get("TPL", 63))
    reps = int(os.environ.get("REPS", 5))

    frame = jnp.asarray(make_stack(1, side)[0].astype(np.float32))
    prep = jax.jit(
        lambda im: ncc.zncc_prepare_image(im, s, s)
    )(frame)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.normal(size=(nb, s, s)).astype(np.float32))
    bank = jax.jit(
        jax.vmap(lambda t: ncc.prep_template(t, side, side))
    )(tiles)
    var_full = jnp.pad(prep["var_sum"], ((0, s - 1), (0, s - 1)))
    _force((prep["Fre"], bank["Ftre"], var_full))

    def runner(bf16):
        fn = jax.jit(
            lambda Fre, Fim, Gre, Gim, var, en: pallas_fftp.ncc_masked_peaks_from_spectra(
                Fre, Fim, Gre, Gim, var, en,
                valid_hw=(side - s + 1, side - s + 1), bf16=bf16,
            )
        )
        def call():
            out = fn(prep["Fre"], prep["Fim"], bank["Ftre"], bank["Ftim"],
                     var_full, bank["energy"])
            _force(out[1:])
            return out
        return call

    # hoisted arm: inputs pre-cast to bf16 so the runner's astype is a
    # no-op in the trace — isolates the kernel-only traffic effect from
    # the per-call conversion cost
    bf = jnp.bfloat16
    prep16 = {k: (v.astype(bf) if k in ("Fre", "Fim") else v)
              for k, v in prep.items()}
    bank16 = {k: (v.astype(bf) if k in ("Ftre", "Ftim") else v)
              for k, v in bank.items()}

    def runner_hoisted():
        fn = jax.jit(
            lambda Fre, Fim, Gre, Gim, var, en: pallas_fftp.ncc_masked_peaks_from_spectra(
                Fre, Fim, Gre, Gim, var, en,
                valid_hw=(side - s + 1, side - s + 1), bf16=True,
            )
        )
        def call():
            out = fn(prep16["Fre"], prep16["Fim"], bank16["Ftre"],
                     bank16["Ftim"], var_full, bank16["energy"])
            _force(out[1:])
            return out
        return call

    arms = {"f32": runner(False), "bf16": runner(True),
            "bf16h": runner_hoisted()}
    for name, call in arms.items():
        call()  # compile
    times = {k: [] for k in arms}
    peaks = {}
    for _ in range(reps):
        for name, call in arms.items():
            t0 = time.perf_counter()
            out = call()
            times[name].append(time.perf_counter() - t0)
            peaks[name] = (np.asarray(out[1]), np.asarray(out[2]))
    for name, ts in times.items():
        print(f"{name:5s}: median {np.median(ts)*1e3:7.1f} ms  "
              f"min {min(ts)*1e3:7.1f} ms  ({nb}-bank, {side}^2)")
    same = (peaks["f32"][0] == peaks["bf16"][0]).all() and (
        peaks["f32"][1] == peaks["bf16"][1]).all()
    print(f"integer peaks identical across arms: {bool(same)}")


if __name__ == "__main__":
    main()
