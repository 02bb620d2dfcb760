"""Persistent-cache plumbing + compile-watcher unit tests.

The env var JAX_COMPILATION_CACHE_DIR does nothing on jax 0.9.0 unless
applied through jax.config (utils/jaxcache.py; VERDICT r4 item 7 — the
170 s cold-compile root cause). These tests pin the plumbing and the
in-window compile counting that gates the HEALTHY stamp.
"""

import jax
import jax.numpy as jnp

from wrinklefree_tpu.utils.jaxcache import (
    CompileWatcher,
    enable_persistent_cache,
)


def test_cache_dir_applied_via_config():
    # conftest set JAX_COMPILATION_CACHE_DIR and applied it; the
    # package import path must agree (idempotent, config wins)
    d = enable_persistent_cache()
    assert d == jax.config.jax_compilation_cache_dir
    assert jax.config.jax_compilation_cache_dir  # actually set


def test_compile_watcher_counts_fresh_compiles():
    w = CompileWatcher()
    snap = w.snapshot()

    @jax.jit
    def f(x):
        return jnp.sin(x) * 3 + 1

    f(jnp.ones((13, 7))).block_until_ready()
    d = w.delta(snap)
    assert d["compiles"] >= 1
    # cached call: no new compile events
    snap2 = w.snapshot()
    f(jnp.ones((13, 7))).block_until_ready()
    assert w.delta(snap2)["compiles"] == 0
    # new shape: compiles again
    f(jnp.ones((14, 7))).block_until_ready()
    assert w.delta(snap2)["compiles"] >= 1
