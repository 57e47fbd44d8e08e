# SPDX-License-Identifier: CECILL-2.1
"""Content-addressed host->device upload dedup for interactive entry points.

The reference's quick-look workflows (ex_03: psd2d + autocorr2d + radial
means on the SAME image) re-enter the library with the same host array
several times. On a hosted TPU every `jnp.asarray(image)` is a fresh wire
transfer — for a 2048x2048 float32 frame that is ~17 MB (~0.4 s on the
~45 MB/s tunnel), repeated per call. Here the frame's content hash
(blake2b, ~1 GB/s on host) keys a small LRU of live device buffers, so
chained public calls on one image upload it once.

Correctness: the key is the full-buffer digest + shape + dtype — a user
mutating the array between calls changes the digest and gets a fresh
upload (no object-identity staleness). Hash cost is ~2% of the transfer
it can save; arrays below the size floor skip the cache entirely.

No reference counterpart (the reference is in-RAM NumPy; SURVEY §3.2
composition is free there). Disable with BARC4DIP_TPU_UPLOAD_CACHE=0.
"""
from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["device_resident", "register_pair", "cache_clear", "cache_info"]

#: smallest array worth hashing: below this the upload's fixed cost
#: dominates and a cache hit saves little
_MIN_BYTES = 1 << 20
#: total device bytes the cache may keep alive (v5e HBM is 16 GB; this
#: bounds the cache's share well below working-set scale)
_MAX_BYTES = 256 << 20

_entries: "OrderedDict[tuple, jax.Array]" = OrderedDict()
_hits = 0
_misses = 0
#: guards _entries/_hits/_misses: entry points may be called from several
#: threads (prefetchers, user pools); dict iteration during eviction must
#: not race inserts
_lock = threading.Lock()


def _enabled() -> bool:
    v = os.environ.get("BARC4DIP_TPU_UPLOAD_CACHE")
    return v is None or v.strip().lower() not in ("0", "false", "no", "off")


def _total_bytes() -> int:
    return sum(e.nbytes for e in _entries.values())


def device_resident(array) -> jax.Array:
    """``jnp.asarray`` with content-addressed dedup for large host arrays.

    jax arrays pass through untouched; host arrays large enough to matter
    are hashed and served from the device cache when their content was
    uploaded before.
    """
    global _hits, _misses
    if isinstance(array, jax.Array):
        return array
    host = np.asarray(array)
    if (
        not _enabled()
        or host.nbytes < _MIN_BYTES
        or not host.flags.c_contiguous
    ):
        return jnp.asarray(host)

    key = _key_for(host)

    with _lock:
        cached = _entries.get(key)
        if cached is not None:
            try:
                alive = not cached.is_deleted()
            except Exception:  # pragma: no cover - defensive backend probing
                alive = False
            if alive:
                _entries.move_to_end(key)
                _hits += 1
                return cached
            del _entries[key]

    device = jnp.asarray(host)
    with _lock:
        _misses += 1
        _entries[key] = device
        while _entries and _total_bytes() > _MAX_BYTES:
            _entries.popitem(last=False)
    return device


def _key_for(host: np.ndarray) -> tuple:
    digest = hashlib.blake2b(
        memoryview(host).cast("B"), digest_size=16
    ).digest()
    # the key carries the placement target: a hit must not return a buffer
    # committed to a different device than an active jax.default_device
    # context would choose. It also carries the CANONICALIZED device dtype:
    # with x64 disabled a float64 host array caches a float32 device
    # buffer, and toggling jax_enable_x64 mid-process must not redeem that
    # stale buffer where jnp.asarray would now produce float64.
    target = repr(getattr(jax.config, "jax_default_device", None))
    dev_dtype = str(jnp.result_type(host.dtype))
    return (digest, host.shape, str(host.dtype), dev_dtype, target)


def register_pair(host, device: jax.Array) -> None:
    """Record that ``host``'s content is already device-resident.

    For producers that COMPUTE a result on device and also return it as
    NumPy (e.g. ``flat_field_correction``'s reference-contract numpy-out
    path): registering the pulled bytes against the live device buffer
    lets a follow-on metric call redeem the device copy instead of
    re-uploading ~17 MB per 2k frame over the tunnel. No-op when the cache
    is disabled, the array is below the size floor, or dtypes/shape don't
    match what ``jnp.asarray(host)`` would produce (a redeemed buffer must
    be indistinguishable from a fresh upload).
    """
    host = np.asarray(host)
    if (
        not _enabled()
        or host.nbytes < _MIN_BYTES
        or not host.flags.c_contiguous
        or not isinstance(device, jax.Array)
        or device.shape != host.shape
        or str(device.dtype) != str(jnp.result_type(host.dtype))
    ):
        return
    key = _key_for(host)
    with _lock:
        _entries[key] = device
        _entries.move_to_end(key)
        while _entries and _total_bytes() > _MAX_BYTES:
            _entries.popitem(last=False)


def cache_clear() -> None:
    """Drop every cached device buffer (frees its HBM on next GC)."""
    global _hits, _misses
    with _lock:
        _entries.clear()
        _hits = 0
        _misses = 0


def cache_info() -> dict:
    with _lock:
        return {
            "entries": len(_entries),
            "bytes": _total_bytes(),
            "hits": _hits,
            "misses": _misses,
        }
