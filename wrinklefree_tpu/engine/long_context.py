"""Long-context serving: ring-attention prefill + context-parallel decode.

Serves requests LONGER than the paged engine's max_context by sharding
the sequence over a mesh axis (SURVEY.md §5.7; VERDICT r1 item 9 — ring
attention as a product path, not a shelf op). TPU-native design, no
reference analog (the reference caps context at host RAM):

- **Prefill**: tokens are sequence-sharded [B, S/P] per device; every
  layer runs :func:`wrinklefree_tpu.ops.ring_attention.ring_attention`
  (K/V blocks rotate via ppermute, online-softmax fold), so per-device
  activation and KV memory is S/P and the full [S, S] score matrix never
  exists. The prompt KV stays sequence-sharded on the devices.
- **Decode**: the new token's q attends to (a) the sharded prompt KV via
  per-device partial online-softmax stats combined with pmax/psum —
  context-parallel attention, O(S/P) work per device — and (b) a small
  replicated buffer holding the freshly generated KV. Projections are
  replicated compute (decode is weight-bandwidth bound; each device
  already streams the full weights in this layout).

Greedy decoding (the long-context regime's dominant mode). Exact vs the
dense forward up to float reduction order — token-identical in f32
(tests/test_long_context.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BitNetConfig
from ..models.bitnet import compute_logits
from ..ops.norms import rms_norm
from ..ops.ring_attention import _block_attend, ring_attention
from ..ops.rope import apply_rope, rope_cos_sin
from ..ops.ternary import ternary_linear


def _proj(x, layers, name, l, dtype):
    return ternary_linear(
        x, layers[f"{name}_qw"][l], layers[f"{name}_scale"][l], out_dtype=dtype
    )


def _mlp(h, layers, l, cfg: BitNetConfig, dtype):
    normed = rms_norm(h, layers["post_ln"][l], cfg.rms_norm_eps)
    gate = _proj(normed, layers, "gate", l, dtype)
    up = _proj(normed, layers, "up", l, dtype)
    if cfg.mlp_act == "silu":
        act = jax.nn.silu(gate) * up
    else:
        act = jnp.square(jax.nn.relu(gate)) * up
    if cfg.sub_norms:
        act = rms_norm(act, layers["ffn_sub"][l], cfg.rms_norm_eps)
    return h + _proj(act, layers, "down", l, dtype)


def _merge(m1, l1, a1, m2, l2, a2, bshape):
    """Online-softmax merge of two partial stats (m, l, acc)."""
    m = jnp.maximum(m1, m2)
    w1 = jnp.exp(m1 - m)
    w2 = jnp.exp(m2 - m)
    return m, l1 * w1 + l2 * w2, a1 * bshape(w1) + a2 * bshape(w2)


class LongContextEngine:
    """Sequence-parallel generate() for prompts beyond paged max_context.

    params: the standard (unfused) parameter pytree — replicated on the
    mesh. mesh: any 1-axis mesh (axis name ``seq``); all devices
    participate in the ring.
    """

    def __init__(self, params, cfg: BitNetConfig, mesh: Mesh,
                 axis: str = "seq", decode_buf: int = 128):
        if axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axis!r}")
        if "qkv_qw" in params["layers"]:
            raise ValueError("LongContextEngine takes unfused params")
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.P = mesh.shape[axis]
        self.decode_buf = decode_buf
        rep = NamedSharding(mesh, P())
        self.params = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), rep), params
        )
        self._prefill_cache = {}
        self._decode_cache = {}

    # -- prefill -----------------------------------------------------------

    # q-chunk width for the blockwise local attention inside each ring
    # step: without it the per-device f32 scores are
    # [KV, G, s_loc, s_loc] — a 16K prompt on ONE device would need
    # ~21 GB for scores alone (>HBM). Chunking the q rows bounds the
    # live score block to [KV, G, CQ, s_loc] (~1.3 GB at 16K) at the
    # cost of one ring pass per chunk (still P-1 ppermutes each,
    # overlappable; decode is untouched).
    PREFILL_Q_CHUNK = 1024

    def _prefill_fn(self, s_loc: int):
        cfg, axis = self.cfg, self.axis
        dtype = cfg.dtype
        CQ = self.PREFILL_Q_CHUNK

        def body(params, tokens_loc, t0):
            # tokens_loc [1, s_loc] this device's slice; t0 [] real length
            layers = params["layers"]
            idx = jax.lax.axis_index(axis)
            pos = idx * s_loc + jnp.arange(s_loc)[None, :]  # [1, s_loc]
            h = params["embed"][tokens_loc].astype(dtype)
            cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta, dtype)
            ks, vs = [], []
            for l in range(cfg.num_layers):
                normed = rms_norm(h, layers["input_ln"][l], cfg.rms_norm_eps)
                q = _proj(normed, layers, "q", l, dtype).reshape(
                    1, s_loc, -1, cfg.head_dim)
                k = _proj(normed, layers, "k", l, dtype).reshape(
                    1, s_loc, -1, cfg.head_dim)
                v = _proj(normed, layers, "v", l, dtype).reshape(
                    1, s_loc, -1, cfg.head_dim)
                q, k = apply_rope(q, k, cos, sin)
                if s_loc > CQ and s_loc % CQ == 0:
                    # blockwise q: sequential ring passes per chunk.
                    # ring_attention's base is idx*Sq + q_offset with
                    # Sq = CQ here; offset it to the chunk's true
                    # global start idx*s_loc + c0.
                    def qchunk(c0, q=q, k=k, v=v):
                        qc = jax.lax.dynamic_slice_in_dim(q, c0, CQ, 1)
                        off = idx * (s_loc - CQ) + c0
                        return ring_attention(
                            qc, k, v, axis,
                            q_offset=jnp.full((1,), off, jnp.int32),
                        )
                    attn = jax.lax.map(
                        qchunk, jnp.arange(0, s_loc, CQ, dtype=jnp.int32)
                    )  # [nc, 1, CQ, NH, D]
                    attn = attn.transpose(1, 0, 2, 3, 4).reshape(
                        1, s_loc, -1, cfg.head_dim)
                else:
                    attn = ring_attention(q, k, v, axis)
                attn = attn.reshape(1, s_loc, -1)
                if cfg.sub_norms:
                    attn = rms_norm(attn, layers["attn_sub"][l],
                                    cfg.rms_norm_eps)
                h = h + _proj(attn, layers, "o", l, dtype)
                h = _mlp(h, layers, l, cfg, dtype)
                ks.append(k)
                vs.append(v)
            # logits only for the LAST real token (t0-1); its owner
            # computes, others contribute zero, psum replicates.
            last = t0 - 1
            own = (last >= idx * s_loc) & (last < (idx + 1) * s_loc)
            off = jnp.clip(last - idx * s_loc, 0, s_loc - 1)
            h_last = jnp.where(own, 1.0, 0.0) * h[:, off]
            h_last = jax.lax.psum(h_last, axis)  # [1, H] replicated
            final = rms_norm(h_last, params["final_norm"], cfg.rms_norm_eps)
            logits = compute_logits(final, params, cfg)  # replicated
            kv = (jnp.stack(ks), jnp.stack(vs))  # [L, 1, s_loc, KV, D] local
            return logits, kv

        spec_tok = P(None, self.axis)
        spec_kv = P(None, None, self.axis)
        return jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), spec_tok, P()),
            out_specs=(P(), (spec_kv, spec_kv)),
            check_rep=False,
        ))

    # -- decode ------------------------------------------------------------

    def _decode_fn(self, s_loc: int, steps: int):
        cfg, axis = self.cfg, self.axis
        dtype = cfg.dtype
        NB = self.decode_buf
        scale = 1.0 / np.sqrt(cfg.head_dim)

        def attend(q, k_loc, v_loc, kb, vb, t0, t):
            """q [1,1,NH,D]; sharded prefix + replicated buffer."""
            B, _, NH, D = q.shape
            KV = k_loc.shape[2]
            G = NH // KV
            idx = jax.lax.axis_index(axis)

            def bshape(f):  # [B,KV,G,1] -> [B,1,NH,1]
                return f.transpose(0, 3, 1, 2).reshape(B, 1, NH)[..., None]

            q_pos = jnp.full((1, 1), 2**30, jnp.int32)  # attends everything
            # prefix shard: keys valid iff global pos < t0
            k_pos_loc = idx * s_loc + jnp.arange(s_loc)
            k_pos_m = jnp.where(k_pos_loc < t0, k_pos_loc, 2**31 - 1)
            m1, l1, a1 = _block_attend(q, k_loc, v_loc, q_pos, k_pos_m, scale)
            # cross-device combine of the prefix partials
            mg = jax.lax.pmax(m1, axis)
            w = jnp.exp(m1 - mg)
            lg = jax.lax.psum(l1 * w, axis)
            ag = jax.lax.psum(a1 * bshape(w), axis)
            # replicated decode buffer: entries valid iff index <= t
            b_pos = jnp.arange(NB)
            b_pos_m = jnp.where(b_pos <= t, t0 + b_pos, 2**31 - 1)
            m2, l2, a2 = _block_attend(q, kb, vb, q_pos, b_pos_m, scale)
            m, l, acc = _merge(mg, lg, ag, m2, l2, a2, bshape)
            l = jnp.maximum(l, 1e-30)
            return (acc / bshape(l)).astype(q.dtype)

        def body(params, prefix_k, prefix_v, tok0, t0):
            layers = params["layers"]

            def step(carry, t):
                tok, kb, vb = carry  # kb/vb [L, 1, NB, KV, D] replicated
                pos = (t0 + t)[None, None]  # [1,1]
                cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta,
                                        dtype)
                h = params["embed"][tok[None, None]].astype(dtype)[0]
                h = h[:, None, :] if h.ndim == 2 else h  # [1,1,H]
                # this step's k/v per layer, committed to the carried
                # buffers in ONE stacked scatter after the layer loop —
                # the per-layer .at[l, :, t].set pair profiled as
                # ~1.7 ms/step of add_bitcast fusions at 16K (the
                # scan-carried buffer copy trap)
                ks_t, vs_t = [], []
                for l in range(cfg.num_layers):
                    normed = rms_norm(h, layers["input_ln"][l],
                                      cfg.rms_norm_eps)
                    q = _proj(normed, layers, "q", l, dtype).reshape(
                        1, 1, -1, cfg.head_dim)
                    k = _proj(normed, layers, "k", l, dtype).reshape(
                        1, 1, -1, cfg.head_dim)
                    v = _proj(normed, layers, "v", l, dtype).reshape(
                        1, 1, -1, cfg.head_dim)
                    q, k = apply_rope(q, k, cos, sin)
                    ks_t.append(k[:, 0])
                    vs_t.append(v[:, 0])
                    # the CURRENT layer's buffer view for attention:
                    # a small per-layer [1, NB, KV, D] copy (164 KB)
                    # instead of writing the whole carried [L, ...]
                    # buffer per layer
                    kb_l = kb[l].at[:, t].set(k[:, 0])
                    vb_l = vb[l].at[:, t].set(v[:, 0])
                    attn = attend(q, prefix_k[l], prefix_v[l],
                                  kb_l, vb_l, t0, t)
                    attn = attn.reshape(1, 1, -1)
                    if cfg.sub_norms:
                        attn = rms_norm(attn, layers["attn_sub"][l],
                                        cfg.rms_norm_eps)
                    h = h + _proj(attn, layers, "o", l, dtype)
                    h = _mlp(h, layers, l, cfg, dtype)
                kb_n = kb.at[:, :, t].set(jnp.stack(ks_t))
                vb_n = vb.at[:, :, t].set(jnp.stack(vs_t))
                final = rms_norm(h[:, 0], params["final_norm"],
                                 cfg.rms_norm_eps)
                logits = compute_logits(final, params, cfg)  # [1, V]
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]
                return (nxt, kb_n, vb_n), nxt

            kb0 = jnp.zeros(
                (cfg.num_layers, 1, NB, cfg.num_kv_heads, cfg.head_dim),
                dtype)
            (_, _, _), toks = jax.lax.scan(
                step, (tok0, kb0, kb0), jnp.arange(steps))
            return toks

        spec_kv = P(None, None, self.axis)
        return jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), spec_kv, spec_kv, P(), P()),
            out_specs=P(),
            check_rep=False,
        ), static_argnames=())

    # -- public API ---------------------------------------------------------

    def generate(self, prompt_ids: List[int], max_new_tokens: int = 32,
                 eos_token_id: Optional[int] = None) -> List[int]:
        """Greedy generation for an arbitrarily long prompt."""
        if max_new_tokens > self.decode_buf:
            raise ValueError(
                f"max_new_tokens {max_new_tokens} > decode_buf "
                f"{self.decode_buf}")
        import time as _time

        t0 = len(prompt_ids)
        if t0 == 0:
            raise ValueError("empty prompt")
        s_loc = -(-t0 // self.P)
        s_loc = max(8, s_loc)  # tiny floor keeps shapes sane
        total = s_loc * self.P
        toks = np.zeros((1, total), np.int32)
        toks[0, :t0] = prompt_ids
        w0 = _time.perf_counter()
        if s_loc not in self._prefill_cache:
            self._prefill_cache[s_loc] = self._prefill_fn(s_loc)
        logits, (pk, pv) = self._prefill_cache[s_loc](
            self.params, jnp.asarray(toks), jnp.asarray(t0, jnp.int32))
        # the int() fetch is the completion barrier (block_until_ready
        # returns early on tunnel transports) -> honest stage walls
        first = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
        w1 = _time.perf_counter()
        self.last_timings = {"prefill_s": w1 - w0, "prompt_tokens": t0}
        if max_new_tokens == 1 or first == eos_token_id:
            return [first]
        key = (s_loc, max_new_tokens - 1)
        if key not in self._decode_cache:
            self._decode_cache[key] = self._decode_fn(s_loc, key[1])
        prof = getattr(self, "profile_decode_dir", None)
        if prof:  # decode-only jax.profiler window (bench tooling)
            jax.profiler.start_trace(prof)
        rest = self._decode_cache[key](
            self.params, pk, pv, jnp.asarray(first, jnp.int32),
            jnp.asarray(t0, jnp.int32))
        out = [first] + [int(x) for x in np.asarray(rest)]
        if prof:
            jax.profiler.stop_trace()
        self.last_timings["decode_s"] = _time.perf_counter() - w1
        self.last_timings["decode_tokens"] = len(out) - 1
        if eos_token_id is not None and eos_token_id in out:
            out = out[: out.index(eos_token_id) + 1]
        return out
