# SPDX-License-Identifier: CECILL-2.1
"""Wall-clock timing and text progress helpers.

Behavioural parity with the reference utilities (reference:
src/barc4dip/utils/time.py:13-104): ``elapsed_time`` prints a human-formatted
duration and returns seconds; ``progress_update``/``progress_done`` render a
10-bucket carriage-return progress bar.
"""
from __future__ import annotations

from time import time

__all__ = ["now", "elapsed_time", "progress_update", "progress_done"]


def now() -> float:
    """Current wall-clock time in seconds since the epoch."""
    return time()


def elapsed_time(t_start: float, verbose: bool = True) -> float | None:
    """Compute and optionally print the elapsed wall-clock time.

    Returns the elapsed seconds (``None`` after printing a sub-second time,
    matching the reference's early-return quirk is deliberately *not*
    reproduced: we always return the float).
    """
    delta_t = time() - t_start

    if verbose:
        if delta_t < 1.0:
            print(f">> Total elapsed time: {delta_t * 1000.0:.2f} ms")
            return delta_t

        hours, rem = divmod(delta_t, 3600.0)
        minutes, seconds = divmod(rem, 60.0)

        if hours >= 1.0:
            print(
                f">> Total elapsed time: "
                f"{int(hours)} h {int(minutes)} min {seconds:.2f} s"
            )
        elif minutes >= 1.0:
            print(f">> Total elapsed time: {int(minutes)} min {seconds:.2f} s")
        else:
            print(f">> Total elapsed time: {seconds:.2f} s")

    return delta_t


def progress_update(loop_name: str, t: int, T: int, last_bucket: int) -> int:
    """Print a 10-bucket progress bar; returns the bucket to pass back next call."""
    bucket = int((10 * t) // max(1, T - 1))
    if bucket != last_bucket:
        progress = 10 * bucket
        bar = "#" * bucket + "-" * (10 - bucket)
        print(f"\r{loop_name}: [{bar}] {progress:3d}%", end="", flush=True)
        return bucket
    return last_bucket


def progress_done(loop_name: str) -> None:
    """Print the final 100% completion line for a progress bar."""
    print(f"\r{loop_name}: [##########] 100%", flush=True)
