# SPDX-License-Identifier: CECILL-2.1
"""Fused full+tiles speckle metric device program (shared by the single-image
aggregator, the chunked stack path and the fused stack pipeline)."""
from __future__ import annotations

from .common import subtile_grids_to_3x3_device, tiled_scalar_fields_device
from .estimators import (
    amplitude_core,
    bandwidth_core,
    distribution_moments_core,
    grain_core,
)

__all__ = ["speckle_device_fn"]


def speckle_device_fn(
    groups: frozenset, mode: str, sat: float | None, eps: float,
    full_maps: bool = True, half_maps: bool = False,
):
    """Build the fused full+tiles program for one static configuration.

    ``full_maps=False`` drops the (N, N) autocorrelation map and lag axes
    from the full-frame grain block — a large-transfer opt-out for stack
    runs (the map dominates device->host traffic at 2k^2).

    Grain and bandwidth deliberately run their own forward FFTs: sharing
    one power spectrum between the autocorrelation and the PSD measured
    ~40% SLOWER end-to-end on the target backend (the saved rfft2 is
    cheaper than materializing the shared half-spectrum for two consumers
    plus the mirror's data movement) — docs/AXON_BACKEND_NOTES.md §4.
    """

    def tile_fn(tile):
        vals: dict = {}
        if "amplitude" in groups:
            vals["amplitude"] = amplitude_core(tile)
        if "grain" in groups:
            vals["grain"] = grain_core(tile, with_map=False)
        if "stats" in groups:
            vals["stats"] = distribution_moments_core(
                tile, saturation_value=sat, eps=eps
            )
        if "bandwidth" in groups:
            vals["bandwidth"] = bandwidth_core(tile)
        # flatten to "group/field" for the generic executor
        return {f"{g}/{k}": v for g, d in vals.items() for k, v in d.items()}

    def fn(img):
        out: dict = {"full": {}}
        if "amplitude" in groups:
            out["full"]["amplitude"] = amplitude_core(img)
        if "grain" in groups:
            out["full"]["grain"] = grain_core(
                img, with_map=full_maps, half_map=half_maps
            )
        if "stats" in groups:
            out["full"]["stats"] = distribution_moments_core(
                img, saturation_value=sat, eps=eps
            )
        if "bandwidth" in groups:
            out["full"]["bandwidth"] = bandwidth_core(img)

        if mode == "subtiles_9x9":
            grids = tiled_scalar_fields_device(img, n=9, compute_fn=tile_fn)
            out["tiles"] = subtile_grids_to_3x3_device(grids)
        elif mode == "tiles_3x3":
            grids = tiled_scalar_fields_device(img, n=3, compute_fn=tile_fn)
            out["tiles"] = {k: {"mean": v} for k, v in grids.items()}
        return out

    return fn
