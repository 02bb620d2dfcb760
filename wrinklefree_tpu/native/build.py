"""Self-building loader for the wf_runtime C++ library.

TPU analog of the reference's JIT-built native kernel (reference
kernels/native.py:136-171 builds C++ with -O3 at import time). We compile
csrc/wf_runtime.cpp with g++ into a content-addressed cache dir and load
it with ctypes (no pybind11 in this toolchain — plain C ABI).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

CSRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "wf_runtime.cpp"
CACHE_DIR = Path(
    os.environ.get("WF_NATIVE_CACHE", Path.home() / ".cache" / "wrinklefree_tpu")
)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    i32p, vpp = c.POINTER(c.c_int32), c.POINTER(c.c_void_p)
    sigs = {
        "wf_alloc_create": (c.c_void_p, [c.c_int32]),
        "wf_alloc_destroy": (None, [c.c_void_p]),
        "wf_alloc_num_free": (c.c_int64, [c.c_void_p]),
        "wf_alloc_alloc": (c.c_int32, [c.c_void_p, c.c_int32, i32p]),
        "wf_alloc_retain": (c.c_int32, [c.c_void_p, c.c_int32]),
        "wf_alloc_release": (c.c_int32, [c.c_void_p, c.c_int32]),
        "wf_alloc_refcount": (c.c_int32, [c.c_void_p, c.c_int32]),
        "wf_radix_create": (c.c_void_p, [c.c_void_p, c.c_int32]),
        "wf_radix_destroy": (None, [c.c_void_p]),
        "wf_radix_match": (
            c.c_int64,
            [c.c_void_p, i32p, c.c_int64, i32p, vpp, c.POINTER(c.c_int64)],
        ),
        "wf_radix_lock": (None, [c.c_void_p, vpp, c.c_int64]),
        "wf_radix_unlock": (None, [c.c_void_p, vpp, c.c_int64]),
        "wf_radix_insert": (c.c_int64, [c.c_void_p, i32p, c.c_int64, i32p, c.c_int64]),
        "wf_radix_evict": (c.c_int64, [c.c_void_p, c.c_int64]),
        "wf_radix_num_cached": (c.c_int64, [c.c_void_p]),
        "wf_radix_reset": (None, [c.c_void_p]),
    }
    for name, (restype, argtypes) in sigs.items():
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = argtypes
    return lib


def _build() -> Path:
    src = CSRC.read_text()
    key = hashlib.sha256(src.encode()).hexdigest()[:16]
    out = CACHE_DIR / f"wf_runtime_{key}.so"
    if out.exists():
        return out
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        tmp_out = Path(td) / out.name
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O2", "-std=c++17", "-shared", "-fPIC",
            str(CSRC), "-o", str(tmp_out),
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_out, out)  # atomic publish
    logger.info("built native runtime: %s", out)
    return out


def load_runtime() -> Optional[ctypes.CDLL]:
    """Compiled wf_runtime library, or None (fallback to Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("WF_DISABLE_NATIVE") == "1":
        return None
    try:
        _lib = _configure(ctypes.CDLL(str(_build())))
    except Exception as e:  # missing toolchain, sandbox, etc.
        logger.warning("native runtime unavailable (%s); using Python fallback", e)
        _lib = None
    return _lib
