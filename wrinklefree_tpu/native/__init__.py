"""Native (C++) host runtime for the engine hot path.

`load_runtime()` returns the compiled wf_runtime shared library (building
it on first use), or None when no C++ toolchain is available — callers
fall back to the pure-Python implementations, the same graceful-fallback
pattern the reference uses for its native kernels (reference
kernels/bitnet_patch.py:22-25, kernels/native.py:136-171).
"""

from .build import load_runtime
from .runtime import NativePageAllocator, NativeRadixCache, native_available

__all__ = [
    "load_runtime",
    "NativePageAllocator",
    "NativeRadixCache",
    "native_available",
]
