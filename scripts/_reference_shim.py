"""Shared import shim for the reference checkout at /root/reference.

The reference targets py3.6-era deps: ``fastprogress`` (not installed
here) and ``np.bool`` (removed in numpy>=1.24). Every script/test that
imports the reference needs the same three patches; this is the single
copy (tests/test_reference_parity.py keeps a self-contained twin so the
test file runs standalone).
"""

import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def import_reference():
    """Patch the environment and import the reference littlemcmc."""

    class _Bar:
        def __init__(self, it, total=None, display=True):
            self._it = it
            self.comment = ""

        def __iter__(self):
            return iter(self._it)

    fp = types.ModuleType("fastprogress")
    fpfp = types.ModuleType("fastprogress.fastprogress")
    fpfp.progress_bar = _Bar
    fp.fastprogress = fpfp
    sys.modules.setdefault("fastprogress", fp)
    sys.modules.setdefault("fastprogress.fastprogress", fpfp)
    if not hasattr(np, "bool"):
        np.bool = np.bool_  # type: ignore[attr-defined]
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import littlemcmc as ref

    return ref
