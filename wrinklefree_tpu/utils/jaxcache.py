"""Persistent-compilation-cache plumbing + in-window compile guard.

Two bugs this module exists to kill:

1. **The env var silently does nothing.** jax 0.9.0's
   `jax_compilation_cache_dir` config no longer reads the
   ``JAX_COMPILATION_CACHE_DIR`` environment variable (the
   `optional_string_state` holder has no env-var hook), so every
   script that only exported the env var ran with the persistent
   cache DISABLED — measured on the chip as `prefill_first_call_s`
   swinging 0.96 -> 170 s between processes (VERDICT r4 item 7;
   `BENCH_r04.json`). `enable_persistent_cache()` reads the env var
   and applies it through `jax.config.update`, which is the only
   plumbing that works on this jax version.

2. **Compiles inside a measured window corrupt the measurement.**
   Round 4 found warmup replays that used a different token budget
   than the measured wave, letting decode-program variants compile
   *inside* the timed region (serving_bench warm-replay fix, commit
   6b596c9). `CompileWatcher` counts XLA backend compiles via
   `jax.monitoring` so benches can assert zero compiles in-window and
   publishers can refuse the HEALTHY stamp otherwise (VERDICT r4
   next-round item 1).

Reference analog: the reference pins its kernels' build artifacts in a
content-hash build cache (`scripts/cache_builds.sh:14-52`); this is the
JAX-executable equivalent.
"""

from __future__ import annotations

import os
import threading

_COMPILE_EVENT = "/jax/core/compile/backend_compile_duration"
_CACHE_HIT_EVENT = "/jax/compilation_cache/cache_hits"

_lock = threading.Lock()
_installed = False
_compiles = 0
_compile_secs = 0.0
_cache_hits = 0


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at
    ``$JAX_COMPILATION_CACHE_DIR`` (or `default_dir`). Returns the
    directory in effect, or None if neither is set.

    Safe to call any time before or after backend init; idempotent; a
    dir already applied via `jax.config` wins (tests' conftest sets its
    own isolated dir).
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or default_dir
    if not d:
        return None
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # default floor (1.0 s) skips persisting the long tail of ~0.3-0.9 s
    # programs — measured 23.3 s of re-compiles in an otherwise warm
    # second bench process. 0.1 s keeps them.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return d


def _install_listeners() -> None:
    global _installed
    with _lock:
        if _installed:
            return
        import jax.monitoring as mon

        def _on_duration(name: str, secs: float, **kw) -> None:
            global _compiles, _compile_secs
            if name == _COMPILE_EVENT:
                with _lock:
                    _compiles += 1
                    _compile_secs += secs

        def _on_event(name: str, **kw) -> None:
            global _cache_hits
            if name == _CACHE_HIT_EVENT:
                with _lock:
                    _cache_hits += 1

        mon.register_event_duration_secs_listener(_on_duration)
        mon.register_event_listener(_on_event)
        _installed = True


class CompileWatcher:
    """Process-wide XLA compile counter.

    >>> w = CompileWatcher()          # installs listeners (idempotent)
    >>> ... warmup ...
    >>> snap = w.snapshot()
    >>> ... measured window ...
    >>> delta = w.delta(snap)         # {"compiles": n, "compile_s": s,
    ...                               #  "cache_hits": h}

    `compiles` counts backend-compile invocations INCLUDING
    persistent-cache hits (a hit fires the event with ~0 duration and
    also bumps `cache_hits`; measured: 3 compiles / 0.096 s / 3 hits on
    a warm second process vs 3 / 2.1 s / 0 cold). For an in-window
    guard, any nonzero `compiles` means warmup failed to cover a
    program variant — hits included, since in-window deserialization
    still pollutes the measured wall.
    """

    def __init__(self) -> None:
        _install_listeners()

    def snapshot(self) -> tuple[int, float, int]:
        with _lock:
            return (_compiles, _compile_secs, _cache_hits)

    def delta(self, snap: tuple[int, float, int]) -> dict:
        c0, s0, h0 = snap
        with _lock:
            return {
                "compiles": _compiles - c0,
                "compile_s": round(_compile_secs - s0, 3),
                "cache_hits": _cache_hits - h0,
            }
