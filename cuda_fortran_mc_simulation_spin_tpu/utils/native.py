"""Build + load the native C++ oracles (csrc/) via g++ and ctypes.

Compiled once into ``.build/`` next to the repo root; recompiled when
the source is newer than the shared object.  Callers should treat a
None return from :func:`load` as "toolchain unavailable" and skip.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "csrc" / "exact_enum.cpp"
_OUT = _REPO / ".build" / "libexact_enum.so"


def build() -> Path | None:
    if not _SRC.exists():
        return None
    if _OUT.exists() and _OUT.stat().st_mtime >= _SRC.stat().st_mtime:
        return _OUT
    _OUT.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_OUT),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return _OUT


def load():
    """Returns the ctypes library with typed signatures, or None."""
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.ising2d_exact.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.ising2d_exact.restype = ctypes.c_int
    lib.clock_exact.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.clock_exact.restype = ctypes.c_int
    return lib


def ising2d_exact(nx: int, ny: int, beta: float) -> tuple[float, float]:
    """Exact (<e>/site, <|m|>/site) for periodic 2-D Ising."""
    lib = load()
    if lib is None:
        raise RuntimeError("native oracle unavailable (no g++?)")
    e = ctypes.c_double()
    m = ctypes.c_double()
    rc = lib.ising2d_exact(nx, ny, beta, ctypes.byref(e), ctypes.byref(m))
    if rc != 0:
        raise ValueError(f"ising2d_exact failed rc={rc}")
    return e.value, m.value


def clock_exact(nx: int, ny: int, q: int, beta: float
                ) -> tuple[float, float]:
    """Exact (<e>/site, <m_x>/site) for the periodic q-state clock."""
    lib = load()
    if lib is None:
        raise RuntimeError("native oracle unavailable (no g++?)")
    e = ctypes.c_double()
    mx = ctypes.c_double()
    rc = lib.clock_exact(nx, ny, q, beta, ctypes.byref(e),
                         ctypes.byref(mx))
    if rc != 0:
        raise ValueError(f"clock_exact failed rc={rc}")
    return e.value, mx.value
