# SPDX-License-Identifier: CECILL-2.1
"""Repro §1: complex64 values corrupt when crossing executable boundaries.

A complex64 array produced by one jitted program and consumed by another
(device-resident, no host round-trip) arrives corrupted on the hosted axon
TPU backend; the same two-program chain is bit-identical to the fused
single program on the CPU backend. Host pulls of the intermediate raise
UNIMPLEMENTED, which is why the corruption is silent inside pipelines.

Expected: PASS on CPU, FAIL on axon (as of jax 0.9 / 2026-08).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(256, 256)).astype(np.float32)
    )

    # two executables: rfft2 | irfft2, complex64 crosses the boundary
    F = jax.jit(jnp.fft.rfft2)(x)
    y_split = jax.jit(lambda F: jnp.fft.irfft2(F, s=(256, 256)))(F)

    # one executable: same math, no boundary
    y_fused = jax.jit(
        lambda x: jnp.fft.irfft2(jnp.fft.rfft2(x), s=(256, 256))
    )(x)

    err = float(jnp.abs(y_split - y_fused).max())
    print(f"max |two-program - fused| = {err:.3e}")
    ok = err < 1e-4
    print("PASS" if ok else "FAIL: complex64 corrupted across executables")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
