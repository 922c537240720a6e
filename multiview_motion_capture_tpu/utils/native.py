"""ctypes bindings to the C++ host runtime (native/mvmc_native.cpp).

Auto-builds the shared library on first use (make -C native) and falls back
to pure-Python implementations when a toolchain is unavailable, so the
package never hard-fails.  Covered components (SURVEY.md §2.2):

- OpenPose BODY_25 JSON parsing (the ingest data loader),
- exact Hungarian assignment (scipy's linear_sum_assignment role),
- union-find group extraction (host-side transform_closure role).
"""
from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmvmc_native.so"


@functools.lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception:
        return None

    lib.mvmc_parse_openpose_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.mvmc_parse_openpose_file.restype = ctypes.c_int
    lib.mvmc_hungarian.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.mvmc_hungarian.restype = None
    lib.mvmc_extract_groups.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.mvmc_extract_groups.restype = None
    return lib


def native_available() -> bool:
    return _load() is not None


def parse_openpose_file(path: Path, max_people: int = 32) -> Optional[np.ndarray]:
    """Parse one OpenPose JSON file -> (n_people, 25, 3) float32, or None to
    signal the caller to use the Python path."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((max_people, 25, 3), dtype=np.float32)
    n = lib.mvmc_parse_openpose_file(str(path).encode(), max_people,
                                     out.reshape(-1))
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n]


def hungarian(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment; returns (rows, cols) like scipy's
    linear_sum_assignment.  Uses the C++ Jonker-Volgenant solver when built,
    else scipy."""
    lib = _load()
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        return linear_sum_assignment(cost)
    transposed = n > m
    if transposed:
        cost = np.ascontiguousarray(cost.T)
        n, m = m, n
    assign = np.empty(n, dtype=np.int32)
    lib.mvmc_hungarian(cost, n, m, assign)
    rows = np.arange(n)[assign >= 0]
    cols = assign[assign >= 0]
    if transposed:
        rows, cols = cols, rows
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
    return rows, cols


def extract_groups_host(x_bin: np.ndarray, valid: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Union-find group extraction on host: returns (rep, group_size) with
    rep[i] = lowest-index member of i's component (n for invalid)."""
    n = len(valid)
    lib = _load()
    if lib is None:
        # pure-python union-find fallback
        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i in range(n):
            if not valid[i]:
                continue
            for j in range(i + 1, n):
                if valid[j] and (x_bin[i, j] or x_bin[j, i]):
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        rep = np.array([find(i) if valid[i] else n for i in range(n)], np.int32)
        size = np.zeros(n, np.int32)
        for i in range(n):
            if valid[i]:
                size[rep[i]] += 1
        gs = np.array([size[rep[i]] if valid[i] else 0 for i in range(n)], np.int32)
        return rep, gs
    rep = np.empty(n, dtype=np.int32)
    gs = np.empty(n, dtype=np.int32)
    lib.mvmc_extract_groups(
        np.ascontiguousarray(x_bin, dtype=np.uint8),
        np.ascontiguousarray(valid, dtype=np.uint8), n, rep, gs,
    )
    return rep, gs
