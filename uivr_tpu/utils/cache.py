"""Disk memoization + image-montage helpers (reference: python/util.py:9-52).

``pickle_cache`` / ``render_cache`` memoize long-running functions (the
reference uses them to cache per-voxel FD sweeps across test runs,
tests/test_integrators.py:172-188); ``gallery`` tiles a stack of slices into
one image (util.py:44-52) for grid-visualization previews.
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def pickle_cache(fname: str, overwrite: bool = False):
    """Cache a function's pickled result on disk."""
    def decorator(fn):
        def decorated(*args, **kwargs):
            if (not overwrite) and os.path.exists(fname):
                with open(fname, "rb") as f:
                    return pickle.load(f)
            result = fn(*args, **kwargs)
            os.makedirs(os.path.dirname(fname) or ".", exist_ok=True)
            with open(fname, "wb") as f:
                pickle.dump(result, f)
            return result
        return decorated
    return decorator


def render_cache(fname: str, overwrite: bool = False, verbose: bool = True):
    """Cache a rendered image as EXR on disk."""
    from ..core import exr_io

    def decorator(fn):
        def decorated(*args, **kwargs):
            if (not overwrite) and os.path.exists(fname):
                if verbose:
                    print(f"[cache hit] {fname}")
                return exr_io.read_exr(fname)
            result = np.asarray(fn(*args, **kwargs))
            os.makedirs(os.path.dirname(fname) or ".", exist_ok=True)
            exr_io.write_exr(fname, result)
            if verbose:
                print(f"[cached] {fname}")
            return result
        return decorated
    return decorator


def gallery(array: np.ndarray, ncols: int = 3) -> np.ndarray:
    """Tile (N, H, W, C) into a (H*nrows, W*ncols, C) montage."""
    n, h, w, c = array.shape
    nrows = n // ncols
    assert n == nrows * ncols, "array length must be divisible by ncols"
    return (array.reshape(nrows, ncols, h, w, c)
            .swapaxes(1, 2)
            .reshape(h * nrows, w * ncols, c))
