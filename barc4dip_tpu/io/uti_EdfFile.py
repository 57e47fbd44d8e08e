# SPDX-License-Identifier: CECILL-2.1
"""Compatibility shim for the reference's vendored module path.

The reference package vendors PyMca's EDF parser at
``barc4dip.io.uti_EdfFile`` (reference io/uti_EdfFile.py:175), and user
code commonly imports ``EdfFile`` from that path directly. This package
implements a clean-room parser with the same surface
(:class:`barc4dip_tpu.io.edf.EdfFile`: ``NumImages``/``GetNumImages``,
``GetHeader``, ``GetData``, ``GetRegion``, gz/bz2 and wrapped-container
support); this module keeps the legacy import path working.
"""
from .edf import EdfFile

__all__ = ["EdfFile"]
