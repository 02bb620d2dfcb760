"""Exact-greedy top-k rescoring head (models/bitnet.greedy_exact_topk).

The int8 head is approximate; this path must be argmax-EXACT vs the
bf16 head on every token (certificate + fallback), unlike the
reference's low-precision head which has no exactness story.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wrinklefree_tpu.config import BitNetConfig
from wrinklefree_tpu.models.bitnet import (
    compute_logits,
    forward,
    greedy_exact_topk,
    init_params,
    quantize_lm_head,
)


@pytest.fixture(scope="module")
def setup():
    cfg = BitNetConfig.tiny(vocab_size=512)
    params = init_params(cfg, seed=0)
    qparams = quantize_lm_head(params, cfg)
    return cfg, params, qparams


def _ref_argmax(hidden, params, cfg):
    # bf16-head reference: argmax over full logits (int8 entries absent)
    clean = {k: v for k, v in params.items() if not k.startswith("lm_head_")}
    return np.asarray(jnp.argmax(compute_logits(hidden, clean, cfg), axis=-1))


def test_matches_full_head_random(setup):
    cfg, params, qparams = setup
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        h = jax.random.normal(sub, (4, cfg.hidden_size), jnp.bfloat16)
        tok, _ = greedy_exact_topk(h, qparams, cfg, k=16)
        np.testing.assert_array_equal(np.asarray(tok), _ref_argmax(h, qparams, cfg))


def test_tiny_k_forces_fallback_still_exact(setup):
    """With k=1 the certificate should often fail -> fallback branch runs,
    and the result must still match the full bf16 head."""
    cfg, params, qparams = setup
    key = jax.random.PRNGKey(2)
    fell_back = 0
    for i in range(8):
        key, sub = jax.random.split(key)
        h = jax.random.normal(sub, (2, cfg.hidden_size), jnp.bfloat16) * 0.05
        tok, certified = greedy_exact_topk(h, qparams, cfg, k=1)
        fell_back += int(not bool(certified))
        np.testing.assert_array_equal(np.asarray(tok), _ref_argmax(h, qparams, cfg))
    # tiny-scale hiddens squeeze logit gaps under the int8 error bound
    assert fell_back > 0


def test_adversarial_near_tie(setup):
    """Hidden aligned with the midpoint of two embedding rows: the two top
    logits differ by less than the int8 error -> must fall back, stay exact."""
    cfg, params, qparams = setup
    emb = np.asarray(qparams["embed"], np.float32)
    a, b = emb[7], emb[11]
    h = jnp.asarray((a + b)[None, :] * 0.5, jnp.bfloat16)
    tok, _ = greedy_exact_topk(h, qparams, cfg, k=8)
    np.testing.assert_array_equal(np.asarray(tok), _ref_argmax(h, qparams, cfg))


def test_forward_head_fn_matches_logits_argmax(setup):
    """forward(head_fn=...) must produce the same greedy stream as
    argmax(forward(...)) with the bf16 head, over a short decode."""
    cfg, params, qparams = setup
    from wrinklefree_tpu.models.bitnet import KVCache

    def head_fn(h, p):
        return greedy_exact_topk(h, p, cfg, k=16)[0]

    B, T = 2, 24
    prompt = jax.random.randint(jax.random.PRNGKey(3), (B, 6), 0, cfg.vocab_size)
    start = jnp.zeros((B,), jnp.int32)

    cache_a = KVCache.zeros(cfg, B, T)
    cache_b = KVCache.zeros(cfg, B, T)
    logits, cache_a = forward(params, cfg, prompt, cache_a, start, logits_all=False)
    tok_a = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    tok_b, cache_b = forward(
        qparams, cfg, prompt, cache_b, start, logits_all=False, head_fn=head_fn
    )
    tok_b = tok_b[:, None]
    np.testing.assert_array_equal(np.asarray(tok_a), np.asarray(tok_b))

    pos = jnp.full((B,), prompt.shape[1], jnp.int32)
    for _ in range(6):
        logits, cache_a = forward(
            params, cfg, tok_a, cache_a, pos, logits_all=False
        )
        nxt_a = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        nxt_b, cache_b = forward(
            qparams, cfg, tok_b, cache_b, pos, logits_all=False, head_fn=head_fn
        )
        nxt_b = nxt_b[:, None]
        np.testing.assert_array_equal(np.asarray(nxt_a), np.asarray(nxt_b))
        tok_a, tok_b, pos = nxt_a, nxt_b, pos + 1


def test_requires_quantized_head(setup):
    cfg, params, _ = setup
    h = jnp.zeros((1, cfg.hidden_size), jnp.bfloat16)
    with pytest.raises(ValueError):
        greedy_exact_topk(h, params, cfg, k=8)


# ---------------------------------------------------------------------------
# Engine-level integration (EngineConfig.exact_head_k)
# ---------------------------------------------------------------------------


def _mk_engines():
    from wrinklefree_tpu.engine import Engine
    from wrinklefree_tpu.models.bitnet import init_params as ip
    from wrinklefree_tpu.config import EngineConfig

    cfg = BitNetConfig.tiny()
    params = ip(cfg, seed=0)
    base = dict(max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
                prefill_buckets=(8, 16, 32))
    ref = Engine(params, cfg, EngineConfig(**base))
    ex = Engine(params, cfg, EngineConfig(**base, exact_head_k=8))
    return ref, ex


def test_engine_exact_head_streams_match():
    from wrinklefree_tpu.engine import SamplingParams

    ref, ex = _mk_engines()
    prompts = [[1, 5, 9, 2, 7], [3, 3, 8], [11, 4, 6, 13, 2, 9, 1]]
    sampling = [
        SamplingParams(max_new_tokens=12),
        SamplingParams(max_new_tokens=12, temperature=0.9, top_p=0.8, seed=7),
        SamplingParams(max_new_tokens=12),
    ]
    out = {}
    for name, eng in (("ref", ref), ("exact", ex)):
        reqs = [eng.submit(p, s) for p, s in zip(prompts, sampling)]
        while eng.step():
            pass
        out[name] = [r.output_ids for r in reqs]
    assert out["ref"] == out["exact"]


def test_engine_exact_head_rejects_int8_logits():
    from wrinklefree_tpu.engine import Engine
    from wrinklefree_tpu.config import EngineConfig
    from wrinklefree_tpu.models.bitnet import init_params as ip

    cfg = BitNetConfig.tiny()
    with pytest.raises(ValueError):
        Engine(ip(cfg, seed=0), cfg, EngineConfig(
            max_batch_slots=2, page_size=8, num_pages=32, max_context=32,
            prefill_buckets=(8, 16), int8_logits=True, exact_head_k=8))
