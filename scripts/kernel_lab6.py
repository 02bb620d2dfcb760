#!/usr/bin/env python
"""Lab 6: decompose the batch-1 decode step (3.55 ms/token as of the
megakernel path) into per-component chain-slope costs on the real TPU.

Chain-slope method (lab 5): run N dependent iterations inside ONE jit
(lax.scan), fetch once; cost = (t(N2) - t(N1)) / (N2 - N1). This removes
the ~30 ms dispatch->fetch transport constant entirely.

Components timed:
  1. attn_block_megakernel chain (one layer, cache aliased)
  2. mlp_block_megakernel chain
  3. lm_head bf16 dot chain  (embed [V, H])
  4. full forward (the composed decode step) chain  == bench.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import (
    KVCache, forward, fuse_projections, init_params,
)
from wrinklefree_tpu.ops.rope import rope_cos_sin
from wrinklefree_tpu.ops.ternary_pallas import make_pallas_linear_fused


def slope(fn, n1=64, n2=512, reps=2):
    """fn(steps) -> fetched result; returns per-step seconds."""
    fn(n1)
    fn(n2)  # compile both
    t1 = min(_time(fn, n1) for _ in range(reps))
    t2 = min(_time(fn, n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def _time(fn, n):
    t0 = time.perf_counter()
    fn(n)
    return time.perf_counter() - t0


def main():
    cfg = BitNetConfig.bitnet_2b()
    T = 328
    params = init_params(cfg, seed=0)
    params = fuse_projections(params, cfg)
    params = jax.device_put(params)
    lf = make_pallas_linear_fused(mega=True)
    stack = params["layers"]
    H, Q, D = cfg.hidden_size, cfg.q_dim, cfg.head_dim
    inter = cfg.intermediate_size
    L = cfg.num_layers

    def rows(a, n):
        return jnp.broadcast_to(
            a.astype(jnp.float32).reshape(L, 1, -1)[:, :, :n], (L, 8, n)
        )

    o_rows = rows(stack["o_scale"][:, None] * jnp.ones((1, H)), H)
    down_rows = rows(stack["down_scale"][:, None] * jnp.ones((1, H)), H)
    iln_rows = rows(stack["input_ln"], H)
    pln_rows = rows(stack["post_ln"], H)
    sub_rows = rows(stack["attn_sub"], Q)
    ffn_rows = rows(stack["ffn_sub"], inter)

    h0 = jnp.ones((1, H), jnp.bfloat16) * 0.01
    ck0 = jnp.zeros((L, 1, T, cfg.num_kv_heads, D), jnp.bfloat16)
    cv0 = jnp.zeros_like(ck0)
    cos, sin = rope_cos_sin(jnp.full((1, 1), 100, jnp.int32), D, cfg.rope_theta, jnp.bfloat16)
    cos8 = jnp.broadcast_to(cos.reshape(1, D), (8, D))
    sin8 = jnp.broadcast_to(sin.reshape(1, D), (8, D))

    import functools

    # 1. attention megakernel chain
    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1, 2))
    def attn_chain(h, ck, cv, st, orr, ir, sr, steps):
        def step(carry, l):
            h, ck, cv = carry
            h, ck, cv = lf.attn_mega(
                h, ck, cv, st["qkv_qw"], st["o_qw"], l % L,
                jnp.int32(100), st["qkv_scale"], orr, ir,
                sr, cos8, sin8, q_dim=Q, n_kv=cfg.num_kv_heads,
                n_heads=cfg.num_heads, head_dim=D, eps=cfg.rms_norm_eps,
                norm2=True,
            )
            return (h, ck, cv), None

        (h, ck, cv), _ = jax.lax.scan(
            step, (h, ck, cv), jnp.arange(steps, dtype=jnp.int32))
        return h, ck, cv

    st = {"ck": ck0, "cv": cv0}  # noqa

    def run_attn(n):
        h, st["ck"], st["cv"] = attn_chain(
            h0, st["ck"], st["cv"], stack, o_rows, iln_rows, sub_rows, n)
        np.asarray(h)

    s_attn = slope(run_attn)
    print(f"attn megakernel : {s_attn*1e6:9.1f} us/call")

    # 2. MLP megakernel chain
    @functools.partial(jax.jit, static_argnames=("steps",))
    def mlp_chain(h, st, dr, pr, fr, steps):
        def step(h, l):
            h = lf.mlp_mega(
                h, st["gateup_qw"], st["down_qw"], l % L,
                st["gateup_scale"], dr, pr, fr,
                eps=cfg.rms_norm_eps, act="relu2", norm2=True,
            )
            return h, None

        h, _ = jax.lax.scan(step, h, jnp.arange(steps, dtype=jnp.int32))
        return h

    def run_mlp(n):
        np.asarray(mlp_chain(h0, stack, down_rows, pln_rows, ffn_rows, n))

    s_mlp = slope(run_mlp)
    print(f"mlp megakernel  : {s_mlp*1e6:9.1f} us/call")

    # 3. lm head chain
    embed = params["embed"]

    @functools.partial(jax.jit, static_argnames=("steps",))
    def head_chain(h, embed, steps):
        def step(h, _):
            logits = jax.lax.dot_general(
                h, embed, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = (h + logits[:, :H].astype(jnp.bfloat16) * 1e-9).astype(jnp.bfloat16)
            return h, None

        h, _ = jax.lax.scan(step, h, None, length=steps)
        return h

    def run_head(n):
        np.asarray(head_chain(h0, embed, n))

    s_head = slope(run_head)
    print(f"lm head (bf16)  : {s_head*1e6:9.1f} us/call")

    # 4. composed decode step chain (== bench decode_window)
    cache = KVCache.zeros(cfg, 1, T)

    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
    def fwd_chain(tok, cache, prm, steps):
        def step(carry, i):
            tok, cache = carry
            logits, cache = forward(
                prm, cfg, tok, cache, jnp.full((1,), 100 + i, jnp.int32),
                logits_all=False, linear_fn=lf)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (nxt, cache), None

        (tok, cache), _ = jax.lax.scan(
            step, (tok, cache), jnp.arange(steps, dtype=jnp.int32))
        return tok, cache

    cst = {"c": cache}

    def run_fwd(n):
        tok, cst["c"] = fwd_chain(jnp.ones((1, 1), jnp.int32), cst["c"], params, n)
        np.asarray(tok)

    s_fwd = slope(run_fwd)
    print(f"full decode step: {s_fwd*1e6:9.1f} us/step")
    print(f"  component sum : {(30*(s_attn+s_mlp)+s_head)*1e6:9.1f} us "
          f"(30*(attn+mlp)+head)")
    print(f"  unexplained   : {(s_fwd-30*(s_attn+s_mlp)-s_head)*1e6:9.1f} us")


if __name__ == "__main__":
    main()
