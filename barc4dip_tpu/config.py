# SPDX-License-Identifier: CECILL-2.1
"""Global configuration for barc4dip_tpu.

Precision policy
----------------
All device kernels compute in the dtype of their input (promoted to at least
float32).  On CPU with ``jax_enable_x64`` this gives float64 bit-parity with
the NumPy/SciPy formulations; on TPU the natural dtype is float32 (with
float64 available through XLA emulation when explicitly requested).

``default_float()`` is used when a function has to materialise constants
(frequency axes, radial grids, ...) whose dtype is not implied by an input.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "default_float",
    "is_x64_enabled",
    "on_tpu",
    "MIN_TILE_PX",
    "SATURATION_VALUE",
]

# Policy constants shared across metric aggregators (reference:
# metrics/speckles.py:192, metrics/sharpness.py:213 hardcode MIN_TILE_PX=128;
# saturation 65535 in metrics/statistics.py:17).
MIN_TILE_PX: int = 128
SATURATION_VALUE: float = 65535.0


def is_x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_float() -> jnp.dtype:
    """Widest float available under the current x64 setting."""
    return jnp.float64 if is_x64_enabled() else jnp.float32


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing must never raise
        return False


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")



def _setup_debug_mode() -> None:
    """BARC4DIP_TPU_DEBUG=1 enables the numerical sanitizer: jax debug-nans
    aborts with a traceback at the first NaN-producing primitive (the
    TPU-native analogue of a sanitizer run; the reference has none).

    Caveat: some legitimate outputs are NaN by contract (frac_sat with
    ``saturation_value=None``, degenerate-tile fallbacks) — use this mode to
    localise *unexpected* NaNs in kernel work, not in production runs."""
    if not _env_flag("BARC4DIP_TPU_DEBUG", False):
        return
    jax.config.update("jax_debug_nans", True)


_setup_debug_mode()


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: the fused metric programs are large
    (up to ~2 min first compile for a 2k x 2k full+tiles program) but fully
    reusable across processes. Opt out with BARC4DIP_TPU_NO_CACHE=1."""
    if _env_flag("BARC4DIP_TPU_NO_CACHE", False):
        return
    cache_dir = os.environ.get(
        "BARC4DIP_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "barc4dip_tpu", "jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()
