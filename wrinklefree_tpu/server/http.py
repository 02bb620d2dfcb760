"""OpenAI-compatible + llama.cpp-compatible HTTP server (aiohttp, SSE).

Endpoint contract = the union the reference serves across its three
backends (SURVEY.md §0): OpenAI `/v1/chat/completions`, `/v1/completions`,
`/v1/models`, `/health` (reference demo/serve_sglang.py:61-114) and
llama.cpp `/completion`, `/tokenize`, `/detokenize`
(reference client/bitnet_client.py:50-104).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import time
from typing import List, Optional

from aiohttp import web

from ..config import BitNetConfig, EngineConfig
from ..engine.engine import Engine
from ..engine.sampling_params import SamplingParams
from .api_types import (
    chat_chunk,
    chat_completion_id,
    chat_response,
    completion_id,
    completion_response,
    format_chat_prompt,
)
from .async_engine import AsyncEngine

logger = logging.getLogger(__name__)


class ByteTokenizer:
    """Trivial byte-level tokenizer for --tiny test serving (vocab 256)."""

    eos_token_id = 0
    chat_template = None

    def encode(self, text: str, **kw) -> List[int]:
        return [1 + (b % 250) for b in text.encode("utf-8")][:2048]

    def decode(self, ids, **kw) -> str:
        # exact inverse of encode for ASCII (id i -> chr(i - 1)); every
        # non-eos id renders one char so detok/usage stay aligned
        return "".join(chr((i - 1) % 250) if i > 0 else "" for i in ids)


class _Detokenizer:
    """Incremental detokenization: decode-all + emit the stable diff."""

    def __init__(self, tokenizer):
        self.tok = tokenizer
        self.ids: List[int] = []
        self.emitted = ""

    def push(self, tok: int) -> str:
        self.ids.append(tok)
        full = self.tok.decode(self.ids, skip_special_tokens=True)
        if full.endswith("�"):  # mid-multibyte
            return ""
        delta = full[len(self.emitted):]
        self.emitted = full
        return delta


class _StopScan:
    """Stop-string scanning over streamed text (OpenAI `stop`, llama.cpp
    `stop`). Holds back the last len(longest)-1 chars while streaming so a
    stop string spanning two deltas is never partially emitted.

    The reference's backends get this from SGLang / llama.cpp server
    [submodule]; here it is a host-side text scan over the incremental
    detokenizer output."""

    def __init__(self, stops):
        self.stops = [s for s in (stops or []) if s]
        self.hold = max((len(s) for s in self.stops), default=1) - 1
        self.text = ""
        self.sent = 0
        self.hit: "str | None" = None

    def push(self, delta: str):
        """Feed a detokenized delta; returns (releasable_text, stopped)."""
        if not self.stops:
            return delta, False
        self.text += delta
        found = [(self.text.find(s), s) for s in self.stops]
        found = [(i, s) for i, s in found if i >= 0]
        if found:
            i, s = min(found)
            out = self.text[self.sent:i]
            self.sent = i
            self.hit = s
            return out, True
        release_to = max(self.sent, len(self.text) - self.hold)
        out = self.text[self.sent:release_to]
        self.sent = release_to
        return out, False

    def flush(self) -> str:
        """Release any held-back tail (stream ended without a stop hit)."""
        out = self.text[self.sent:]
        self.sent = len(self.text)
        return out


def _parse_stops(body: dict):
    """OpenAI `stop`: string or list of strings (also llama.cpp `stop`)."""
    stop = body.get("stop")
    if stop is None:
        return []
    if isinstance(stop, str):
        return [stop]
    if isinstance(stop, list):
        return [s for s in stop if isinstance(s, str) and s]
    return []


class InferenceServer:
    def __init__(self, engine, tokenizer, model_name: str):
        """``engine``: one Engine, or a list of DP replica Engines
        (served behind AsyncEngine's least-loaded router)."""
        self.async_engine = AsyncEngine(engine)
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.start_time = time.time()

    # -- request plumbing -------------------------------------------------

    def _sampling_from(self, body: dict, is_llamacpp=False) -> SamplingParams:
        if is_llamacpp:
            max_new = int(body.get("n_predict", 128))
            if max_new < 0:
                max_new = 512
        else:
            max_new = int(body.get("max_tokens", body.get("max_new_tokens", 128)))
        # llama.cpp names: repeat_penalty / repeat_last_n; OpenAI names:
        # presence_penalty / frequency_penalty (+ the common
        # repetition_penalty extension) — reference client request fields
        # (client/bitnet_client.py) and llama-server sampler params.
        rep = float(
            body.get("repeat_penalty", body.get("repetition_penalty", 1.0))
        )
        last_n = int(body.get("repeat_last_n", body.get("penalty_last_n", 64)))
        # Logprobs: llama.cpp `n_probs` (llama-server sampler field); OpenAI
        # chat `logprobs: bool` + `top_logprobs: int`; legacy OpenAI
        # completions `logprobs: int`. Engine-side k must be >= 1 whenever
        # the chosen token's logprob is wanted, even with 0 alternatives.
        if is_llamacpp:
            lp_k = int(body.get("n_probs", 0) or 0)
        else:
            lp = body.get("logprobs")
            if isinstance(lp, bool):
                lp_k = max(1, int(body.get("top_logprobs", 0) or 0)) if lp else 0
            else:
                lp_k = int(lp or 0)
        # OpenAI `logit_bias`: {"token_id": -100..100} — -100 bans the
        # token; llama.cpp `logit_bias`: [[id, bias]] with `false` = ban.
        lb = body.get("logit_bias")
        bias = []
        if isinstance(lb, dict):
            for k, v in lb.items():
                b = float(v)
                bias.append((int(k), -1e9 if b <= -100.0 else b))
        elif isinstance(lb, list):
            for pair in lb:
                if not (isinstance(pair, (list, tuple)) and len(pair) == 2):
                    continue
                tid, v = pair
                bias.append((int(tid), -1e9 if v is False else float(v)))
        # OpenAI `response_format`: json_object forces any valid JSON
        # object; json_schema (and llama.cpp `json_schema`) compiles the
        # schema to GBNF (engine/schema_to_gbnf.py) and enforces it.
        rf = body.get("response_format")
        json_mode = isinstance(rf, dict) and rf.get("type") == "json_object"
        schema = None
        if isinstance(rf, dict) and rf.get("type") == "json_schema":
            js = rf.get("json_schema")
            schema = (js or {}).get("schema") if isinstance(js, dict) else None
            if schema is None:
                schema = {}
        if body.get("json_schema") is not None:
            schema = body.get("json_schema")
        schema_grammar = None
        if schema is not None:
            if not isinstance(schema, dict):
                raise ValueError("json_schema must be an object")
            if schema:
                from ..engine.schema_to_gbnf import schema_to_gbnf

                schema_grammar = schema_to_gbnf(schema)
            else:
                json_mode = True  # empty schema: any JSON object
        # llama.cpp GBNF `grammar` (engine/gbnf.py); parse errors 400 here
        grammar = body.get("grammar") or schema_grammar or None
        if grammar is not None:
            if not isinstance(grammar, str):
                raise ValueError("'grammar' must be a GBNF string")
            from ..engine.gbnf import GbnfValidator

            GbnfValidator(grammar)  # raises GbnfError (a ValueError)
        # engine-level constraints checked HERE so streaming handlers can
        # 400 before SSE headers go out (submit() re-checks as defense)
        ecfg = self.async_engine.engine.ecfg
        if len(bias) > ecfg.logit_bias_slots:
            raise ValueError(
                f"logit_bias has {len(bias)} entries; max "
                f"{ecfg.logit_bias_slots}"
            )
        if (json_mode or grammar) and lp_k > 0:
            raise ValueError(
                "constrained decoding (json/grammar) with logprobs "
                "not supported"
            )
        return SamplingParams(
            temperature=float(body.get("temperature", 0.7)),
            top_p=float(body.get("top_p", 0.9)),
            top_k=int(body.get("top_k", 0)),
            max_new_tokens=max(1, max_new),
            ignore_eos=bool(body.get("ignore_eos", False)),
            min_p=float(body.get("min_p", 0.0)),
            typical_p=float(body.get("typical_p", 1.0)),
            tfs_z=float(body.get("tfs_z", 1.0)),
            mirostat=int(body.get("mirostat", 0) or 0),
            mirostat_tau=float(body.get("mirostat_tau", 5.0)),
            mirostat_eta=float(body.get("mirostat_eta", 0.1)),
            # OpenAI/llama.cpp `seed`: llama.cpp uses -1 for "random"
            seed=(
                int(body["seed"])
                if body.get("seed") is not None and int(body.get("seed", -1)) >= 0
                else None
            ),
            repetition_penalty=rep,
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            penalty_last_n=last_n,
            logprobs_k=max(0, lp_k),
            logit_bias=bias or None,
            json_mode=json_mode,
            grammar=grammar,
        )

    def _ensure_token_pieces(self):
        """Populate Engine.token_pieces (id -> decoded text) once; the
        constrained-decoding validator checks candidate pieces against
        it (engine/json_constraint.py). Special tokens must decode to ""
        (the engine's never-legal-JSON guard keys on empty pieces), so
        decoding skips specials. Heavy for 128K vocabs — handlers call
        this via run_in_executor, not on the event loop."""
        eng = self.async_engine.engine
        if eng.token_pieces is None:
            eng.token_pieces = [
                self.tokenizer.decode([i], skip_special_tokens=True)
                for i in range(eng.cfg.vocab_size)
            ]
        for e in self.async_engine.engines[1:]:  # DP replicas share the list
            if e.token_pieces is None:
                e.token_pieces = eng.token_pieces

    async def _prepare_sampling(self, sampling):
        if sampling.constrained:
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, self._ensure_token_pieces)

    # -- logprobs rendering --------------------------------------------------
    # Per-token data comes from Request.logprobs_seq: one
    # (chosen_logprob, [(token_id, logprob), ...]) tuple per emitted token,
    # computed inside the jitted decode/prefill programs (engine/engine.py).

    def _tok_str(self, tok: int) -> str:
        return self.tokenizer.decode([tok], skip_special_tokens=False)

    def _chat_lp_entry(self, tok: int, entry, top_n: int) -> dict:
        chosen, tops = entry
        s = self._tok_str(tok)
        return {
            "token": s,
            "logprob": chosen,
            "bytes": list(s.encode("utf-8")),
            "top_logprobs": [
                {
                    "token": self._tok_str(t),
                    "logprob": lp,
                    "bytes": list(self._tok_str(t).encode("utf-8")),
                }
                for t, lp in tops[:top_n]
            ],
        }

    def _chat_logprobs(self, req, top_n: int) -> dict:
        """OpenAI chat `choices[].logprobs` object."""
        return {
            "content": [
                self._chat_lp_entry(tok, e, top_n)
                for tok, e in zip(req.output_ids, req.logprobs_seq)
            ]
        }

    def _completion_logprobs(self, req, top_n: int) -> dict:
        """Legacy OpenAI completions `logprobs` object."""
        tokens, token_logprobs, top_logprobs, offsets = [], [], [], []
        off = 0
        for tok, (chosen, tops) in zip(req.output_ids, req.logprobs_seq):
            s = self._tok_str(tok)
            tokens.append(s)
            token_logprobs.append(chosen)
            top_logprobs.append({self._tok_str(t): lp for t, lp in tops[:top_n]})
            offsets.append(off)
            off += len(s)
        return {
            "tokens": tokens,
            "token_logprobs": token_logprobs,
            "top_logprobs": top_logprobs,
            "text_offset": offsets,
        }

    def _lp_chunk_openai(self, tok: int, entry, top_n: int) -> dict:
        """Single-token legacy logprobs object for streamed completions."""
        chosen, tops = entry
        s = self._tok_str(tok)
        return {
            "tokens": [s],
            "token_logprobs": [chosen],
            "top_logprobs": [{self._tok_str(t): lp for t, lp in tops[:top_n]}],
            "text_offset": [0],
        }

    def _llamacpp_probs(self, req, top_n: int) -> list:
        """llama.cpp `completion_probabilities` (n_probs)."""
        import math

        out = []
        for tok, (_, tops) in zip(req.output_ids, req.logprobs_seq):
            out.append(
                {
                    "content": self._tok_str(tok),
                    "probs": [
                        {"tok_str": self._tok_str(t), "prob": math.exp(lp)}
                        for t, lp in tops[:top_n]
                    ],
                }
            )
        return out

    def _encode(self, prompt) -> List[int]:
        if isinstance(prompt, list):  # already token ids
            return [int(t) for t in prompt]
        return list(self.tokenizer.encode(prompt))

    # -- handlers ----------------------------------------------------------

    async def health(self, request):
        return web.json_response(
            {"status": "ok", "uptime_s": round(time.time() - self.start_time, 1)}
        )

    async def models(self, request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {"id": self.model_name, "object": "model", "owned_by": "wrinklefree-tpu"}
                ],
            }
        )

    async def stats(self, request):
        engines = self.async_engine.engines
        agg: dict = {}
        for e in engines:
            for k, v in e.stats.items():
                agg[k] = agg.get(k, 0) + v
        out = {
            **agg,
            "free_pages": sum(e.allocator.num_free for e in engines),
            "cached_pages": sum(
                e.radix.num_cached_pages if e.radix else 0 for e in engines
            ),
            "active_slots": sum(
                sum(s is not None for s in e.slots) for e in engines
            ),
            "queued": sum(e.waiting.qsize() for e in engines),
            "latency": self.async_engine.engine.latency_summary(),
        }
        if len(engines) > 1:
            out["replicas"] = len(engines)
            out["per_replica_requests"] = [
                e.stats.get("requests", 0) for e in engines
            ]
        return web.json_response(out)

    async def props(self, request):
        """llama.cpp `/props`: server properties + generation defaults
        (llama-server ops surface; the reference's BitNet.cpp backend
        serves the same endpoint)."""
        eng = self.async_engine.engine
        return web.json_response(
            {
                "model_path": self.model_name,
                "total_slots": len(eng.slots),
                "chat_template": getattr(self.tokenizer, "chat_template", None)
                or "",
                "default_generation_settings": {
                    "n_ctx": eng.ecfg.max_context,
                    "params": {
                        "temperature": 0.7,
                        "top_p": 0.9,
                        "top_k": 0,
                        "min_p": 0.0,
                        "n_predict": 128,
                    },
                },
            }
        )

    async def slots(self, request):
        """llama.cpp `/slots`: per-slot occupancy and progress. With
        DP replicas (--dp N) every replica's slots are listed with a
        `replica` field, ids globally numbered — the least-loaded
        request distribution is directly observable here."""
        engines = self.async_engine.engines
        dp = len(engines) > 1
        out = []
        base = 0
        for rep, eng in enumerate(engines):
            for i, r in enumerate(eng.slots):
                entry = {"id": base + i}
                if dp:
                    entry["replica"] = rep
                if r is None:
                    entry["state"] = "idle"
                else:
                    entry.update({
                        "state": "prefill" if r.pending else "decoding",
                        "request_id": r.rid,
                        "prompt_tokens": len(r.prompt_ids),
                        "generated_tokens": len(r.output_ids),
                        "seq_len": int(r.seq_len),
                    })
                out.append(entry)
            base += len(eng.slots)
        return web.json_response(out)

    async def metrics(self, request):
        """Prometheus text exposition (llama-server `/metrics` analog;
        reference ops parity — SURVEY.md §5.5 metrics schema)."""
        eng = self.async_engine.engine
        engines = self.async_engine.engines
        s: dict = {}
        for e in engines:
            for k, v in e.stats.items():
                s[k] = s.get(k, 0) + v
        busy = sum(
            sum(x is not None for x in e.slots) for e in engines
        )
        lines = [
            "# TYPE wf_requests_total counter",
            f"wf_requests_total {s.get('requests', 0)}",
            "# TYPE wf_decode_tokens_total counter",
            f"wf_decode_tokens_total {s.get('decode_tokens', 0)}",
            "# TYPE wf_prefill_tokens_total counter",
            f"wf_prefill_tokens_total {s.get('prefill_tokens', 0)}",
            "# TYPE wf_decode_steps_total counter",
            f"wf_decode_steps_total {s.get('decode_steps', 0)}",
            "# TYPE wf_radix_hit_tokens_total counter",
            f"wf_radix_hit_tokens_total {s.get('radix_hit_tokens', 0)}",
            "# TYPE wf_slots_busy gauge",
            f"wf_slots_busy {busy}",
            "# TYPE wf_slots_total gauge",
            f"wf_slots_total {sum(len(e.slots) for e in engines)}",
            "# TYPE wf_replicas gauge",
            f"wf_replicas {len(engines)}",
            "# TYPE wf_queue_waiting gauge",
            f"wf_queue_waiting {sum(e.waiting.qsize() for e in engines)}",
            "# TYPE wf_kv_pages_free gauge",
            f"wf_kv_pages_free {sum(e.allocator.num_free for e in engines)}",
            "# TYPE wf_kv_pages_cached gauge",
            f"wf_kv_pages_cached "
            f"{sum(e.radix.num_cached_pages if e.radix else 0 for e in engines)}",
            "# TYPE wf_uptime_seconds gauge",
            f"wf_uptime_seconds {round(time.time() - self.start_time, 1)}",
        ]
        lat = eng.latency_summary()
        if lat:
            lines.append("# TYPE wf_ttft_seconds summary")
            for p, v in lat["ttft_s"].items():
                lines.append(
                    f'wf_ttft_seconds{{quantile="0.{p[1:]}"}} {v}'
                )
            lines.append("# TYPE wf_e2e_latency_seconds summary")
            for p, v in lat["e2e_s"].items():
                lines.append(
                    f'wf_e2e_latency_seconds{{quantile="0.{p[1:]}"}} {v}'
                )
        return web.Response(
            text="\n".join(lines) + "\n",
            content_type="text/plain",
        )

    # -- embeddings ---------------------------------------------------------
    # OpenAI /v1/embeddings + llama.cpp /embedding (llama-server surface;
    # the reference's BitNet.cpp backend serves the same endpoint).
    # Masked mean-pool over final hidden states, L2-normalized; one jitted
    # program per pow2 length bucket.

    def _embed_program(self, bucket: int):
        progs = getattr(self, "_embed_jits", None)
        if progs is None:
            progs = self._embed_jits = {}
        if bucket not in progs:
            import jax
            import jax.numpy as jnp

            eng = self.async_engine.engine
            cfg = eng.cfg
            if eng.mesh is not None:
                # TP engines hold sharded/TP-repacked params the plain
                # dense forward can't consume; embed single-device from
                # the engine's unfused snapshot instead (r2 weak item 8:
                # the endpoint used to reject tp > 1 outright)
                if jax.devices()[0].platform == "tpu":
                    from ..ops.ternary_pallas import make_pallas_linear_stacked

                    lf = make_pallas_linear_stacked()
                else:
                    lf = None
            else:
                lf = eng._linear_fn

            @jax.jit
            def run(params, toks, length):  # toks [1, bucket], length []
                from ..models.bitnet import KVCache, forward

                cache = KVCache.zeros(cfg, 1, bucket)
                hidden, _ = forward(
                    params, cfg, toks, cache, jnp.zeros((1,), jnp.int32),
                    logits_all=True, head_fn=lambda h, p: h, linear_fn=lf,
                )  # [1, bucket, H]
                mask = (jnp.arange(bucket) < length)[None, :, None]
                s = jnp.sum(
                    hidden.astype(jnp.float32) * mask, axis=1
                ) / jnp.maximum(length, 1)
                emb = s / jnp.clip(
                    jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-9
                )
                return emb[0]

            progs[bucket] = run
        return progs[bucket]

    def _embed_one(self, ids):
        import numpy as np
        import jax.numpy as jnp

        eng = self.async_engine.engine
        # TP engines embed from the unsharded snapshot (single device);
        # non-TP engines use the live (possibly fused) params directly
        params = eng._long_ctx_params if eng.mesh is not None else eng.params
        ids = ids[: eng.ecfg.max_context]
        bucket = 16
        while bucket < len(ids):
            bucket *= 2
        toks = np.zeros((1, bucket), np.int32)
        toks[0, : len(ids)] = ids
        fn = self._embed_program(bucket)
        out = fn(params, jnp.asarray(toks), jnp.asarray(len(ids)))
        return np.asarray(out).tolist()

    async def embeddings(self, request):
        """OpenAI `/v1/embeddings`."""
        body = await request.json()
        inp = body.get("input", "")
        # OpenAI input forms: "str" | ["str", ...] | [int, ...] (one
        # tokenized prompt) | [[int, ...], ...]
        if isinstance(inp, str):
            items = [inp]
        elif isinstance(inp, list) and inp and all(
            isinstance(x, int) for x in inp
        ):
            items = [inp]
        elif isinstance(inp, list):
            items = inp
        else:
            items = []
        if (
            not items
            or len(items) > 64
            or not all(
                isinstance(x, str)
                or (isinstance(x, list) and all(isinstance(t, int) for t in x))
                for x in items
            )
        ):
            return web.json_response(
                {"error": {"message": "input must be 1..64 strings "
                                      "or token-id lists"}},
                status=400,
            )
        loop = asyncio.get_running_loop()
        data, total = [], 0
        try:
            for i, text in enumerate(items):
                ids = self._encode(text) if isinstance(text, str) else list(text)
                emb = await loop.run_in_executor(None, self._embed_one, ids)
                data.append(
                    {"object": "embedding", "embedding": emb, "index": i}
                )
                total += len(ids)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        return web.json_response({
            "object": "list",
            "model": self.model_name,
            "data": data,
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    async def llamacpp_embedding(self, request):
        """llama.cpp `/embedding`."""
        body = await request.json()
        ids = self._encode(body.get("content", ""))
        loop = asyncio.get_running_loop()
        try:
            emb = await loop.run_in_executor(None, self._embed_one, ids)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        return web.json_response({"embedding": emb})

    async def admin_reset_cache(self, request):
        """Drop every radix-cached page on every replica (llama.cpp's
        slots-erase analog; Engine.reset_prefix_cache). 409 while any
        replica has requests in flight."""
        dropped = []
        try:
            for e in self.async_engine.engines:
                dropped.append(e.reset_prefix_cache())
        except RuntimeError as err:
            return web.json_response(
                {"error": {"message": str(err)}}, status=409)
        return web.json_response({"dropped_pages": dropped})

    async def admin_snapshot(self, request):
        """Request-level preemption snapshot (engine.snapshot): token ids
        + sampling state only — KV is a recomputable cache (SURVEY.md
        §5.3; reference has no elastic recovery). POST the result to
        /admin/restore on this or another server to resume."""
        engines = self.async_engine.engines
        snap = engines[0].snapshot()
        for e in engines[1:]:  # DP replicas: merge request lists
            snap["requests"].extend(e.snapshot()["requests"])
        return web.json_response(snap)

    async def admin_restore(self, request):
        body = await request.json()
        if any(d.get("json_mode") or d.get("grammar")
               for d in body.get("requests", [])):
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, self._ensure_token_pieces)
        engines = self.async_engine.engines
        try:
            if len(engines) == 1:
                reqs = engines[0].restore(body)
            else:  # spread restored requests round-robin over replicas
                entries = body.get("requests", [])
                reqs = []
                for rep, e in enumerate(engines):
                    part = entries[rep::len(engines)]
                    if part:
                        reqs.extend(e.restore(
                            {"version": body.get("version"), "requests": part}
                        ))
        except (ValueError, KeyError) as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        self.async_engine.wake_all()
        return web.json_response({"restored": len(reqs)})

    async def tokenize(self, request):
        body = await request.json()
        ids = self._encode(body.get("content", body.get("text", "")))
        return web.json_response({"tokens": ids})

    async def detokenize(self, request):
        body = await request.json()
        text = self.tokenizer.decode(body.get("tokens", []), skip_special_tokens=True)
        return web.json_response({"content": text})

    async def chat_completions(self, request):
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": {"message": "invalid JSON"}}, status=400)
        messages = body.get("messages")
        if not isinstance(messages, list) or not messages:
            return web.json_response(
                {"error": {"message": "'messages' must be a non-empty list"}}, status=400
            )
        prompt = format_chat_prompt(messages, self.tokenizer)
        ids = self._encode(prompt)
        try:
            sampling = self._sampling_from(body)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        await self._prepare_sampling(sampling)
        stops = _parse_stops(body)
        cid = chat_completion_id()
        lp_top = (
            int(body.get("top_logprobs", 0) or 0)
            if body.get("logprobs") is True
            else None
        )
        try:
            n = self._parse_n(body)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        try:
            if body.get("stream"):
                if n > 1:
                    return web.json_response(
                        {"error": {"message": "stream with n > 1 not supported"}},
                        status=400,
                    )
                return await self._stream_chat(
                    request, cid, ids, sampling, stops, lp_top=lp_top,
                    usage=self._want_usage(body),
                )
            runs = await self._run_n(ids, sampling, stops, n)
            choices, completion_toks = [], 0
            for i, (req, text, hit) in enumerate(runs):
                reason = "stop" if hit is not None else (req.finish_reason or "stop")
                choice = {
                    "index": i,
                    "message": {"role": "assistant", "content": text},
                    "finish_reason": reason,
                }
                if lp_top is not None:
                    choice["logprobs"] = self._chat_logprobs(req, lp_top)
                choices.append(choice)
                completion_toks += len(req.output_ids)
            payload = chat_response(
                cid, self.model_name, "", "stop", len(ids), completion_toks
            )
            payload["choices"] = choices
            return web.json_response(payload)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)

    async def completions(self, request):
        body = await request.json()
        prompt = body.get("prompt", "")
        ids = self._encode(prompt)
        try:
            sampling = self._sampling_from(body)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        await self._prepare_sampling(sampling)
        stops = _parse_stops(body)
        cid = completion_id()
        lp_top = int(body.get("logprobs") or 0) or None
        try:
            n = self._parse_n(body)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        echo = bool(body.get("echo", False))
        prompt_text = prompt if isinstance(prompt, str) else (
            self.tokenizer.decode(ids, skip_special_tokens=True)
        )
        try:
            if body.get("stream"):
                if n > 1:
                    return web.json_response(
                        {"error": {"message": "stream with n > 1 not supported"}},
                        status=400,
                    )
                return await self._stream_completion(
                    request, cid, ids, sampling, openai=True, stops=stops,
                    lp_top=lp_top, echo_text=prompt_text if echo else None,
                    usage=self._want_usage(body),
                )
            runs = await self._run_n(ids, sampling, stops, n)
            choices, completion_toks = [], 0
            for i, (req, text, hit) in enumerate(runs):
                reason = "stop" if hit is not None else (req.finish_reason or "stop")
                choices.append({
                    "index": i,
                    "text": (prompt_text + text) if echo else text,
                    "finish_reason": reason,
                    "logprobs": (
                        self._completion_logprobs(req, lp_top) if lp_top else None
                    ),
                })
                completion_toks += len(req.output_ids)
            payload = completion_response(
                cid, self.model_name, "", "stop", len(ids), completion_toks
            )
            payload["choices"] = choices
            return web.json_response(payload)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)

    async def llamacpp_completion(self, request):
        """llama.cpp-style /completion (reference client/bitnet_client.py:50-104)."""
        body = await request.json()
        ids = self._encode(body.get("prompt", ""))
        try:
            sampling = self._sampling_from(body, is_llamacpp=True)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}}, status=400)
        await self._prepare_sampling(sampling)
        stops = _parse_stops(body)
        n_probs = int(body.get("n_probs", 0) or 0)
        try:
            if body.get("stream"):
                return await self._stream_completion(
                    request, completion_id(), ids, sampling, openai=False,
                    stops=stops, lp_top=n_probs or None,
                )
            req, text, hit = await self._run(ids, sampling, stops)
            extra = (
                {"completion_probabilities": self._llamacpp_probs(req, n_probs)}
                if n_probs
                else {}
            )
            return web.json_response(
                {
                    **extra,
                    "content": text,
                    "stop": True,
                    "stopped_eos": req.finish_reason == "stop" and hit is None,
                    "stopped_word": hit is not None,
                    "stopping_word": hit or "",
                    "stopped_limit": req.finish_reason == "length" and hit is None,
                    "tokens_predicted": len(req.output_ids),
                    "tokens_evaluated": len(ids),
                    "timings": self._timings(req, len(ids)),
                }
            )
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)

    # -- generation helpers -------------------------------------------------

    @staticmethod
    def _timings(req, n_prompt: int) -> dict:
        """llama.cpp `timings` response block (llama-server parity),
        from the engine's per-request timestamps."""
        n_pred = len(req.output_ids)
        out = {"prompt_n": n_prompt, "predicted_n": n_pred}
        if req.first_token_t is not None:
            prompt_ms = (req.first_token_t - req.arrival_t) * 1000
            out["prompt_ms"] = round(prompt_ms, 2)
            out["prompt_per_second"] = round(
                n_prompt / max(prompt_ms / 1000, 1e-9), 2
            )
        # finish_t may lag: on_token(fin=True) fires just before the
        # engine records it — fall back to now
        end_t = req.finish_t if req.finish_t is not None else time.monotonic()
        if req.first_token_t is not None:
            pred_ms = (end_t - req.first_token_t) * 1000
            out["predicted_ms"] = round(pred_ms, 2)
            out["predicted_per_second"] = round(
                max(n_pred - 1, 0) / max(pred_ms / 1000, 1e-9), 2
            )
        return out

    @staticmethod
    def _parse_n(body: dict) -> int:
        """OpenAI `n`: int, 1..16 here (each choice takes an engine
        slot; OpenAI's own cap is 128)."""
        try:
            n = int(body.get("n", 1))
        except (TypeError, ValueError):
            raise ValueError("'n' must be an integer")
        if not 1 <= n <= 16:
            raise ValueError("'n' must be between 1 and 16")
        return n

    @staticmethod
    def _want_usage(body: dict) -> bool:
        """OpenAI `stream_options: {"include_usage": true}`."""
        so = body.get("stream_options") or {}
        return bool(isinstance(so, dict) and so.get("include_usage"))

    async def _run_n(self, ids, sampling, stops, n: int):
        """n independent completions (OpenAI `n`). With an explicit seed,
        choice i samples on stream seed+i (same-seed choices would be
        identical by design of the per-request RNG)."""
        import dataclasses as _dc

        if n == 1:
            return [await self._run(ids, sampling, stops)]
        samps = [
            sampling if sampling.seed is None
            else _dc.replace(sampling, seed=sampling.seed + i)
            for i in range(n)
        ]
        results = await asyncio.gather(
            *(self._run(ids, s, stops) for s in samps),
            return_exceptions=True,
        )
        errs = [r for r in results if isinstance(r, BaseException)]
        if errs:
            # cancel surviving siblings so they don't decode headless
            for r in results:
                if not isinstance(r, BaseException) and not r[0].finished:
                    self.async_engine.engine.cancel(r[0], "abort")
            raise errs[0]
        return list(results)

    async def _run(self, ids, sampling, stops=None):
        detok = _Detokenizer(self.tokenizer)
        scan = _StopScan(stops)
        req = None
        parts = []
        async for tok, fin, r in self.async_engine.generate_stream(ids, sampling):
            req = r
            if tok >= 0:
                out, stopped = scan.push(detok.push(tok))
                parts.append(out)
                if stopped:
                    self.async_engine.engine.cancel(req, "stop")
                    break
        if req is not None and req.finish_reason == "oom":
            raise ValueError("request cannot fit in KV cache")
        if scan.hit is None:
            parts.append(scan.flush())
        return req, "".join(parts), scan.hit

    async def _stream_chat(self, request, cid, ids, sampling, stops=None,
                           lp_top=None, usage=False):
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            }
        )
        await resp.prepare(request)
        await resp.write(
            chat_chunk(cid, self.model_name, {"role": "assistant"}).encode()
        )
        detok = _Detokenizer(self.tokenizer)
        scan = _StopScan(stops)
        finish = "stop"
        n = 0
        async for tok, fin, req in self.async_engine.generate_stream(ids, sampling):
            if tok >= 0:
                delta, stopped = scan.push(detok.push(tok))
                lp = None
                if lp_top is not None and n < len(req.logprobs_seq):
                    lp = {"content": [
                        self._chat_lp_entry(tok, req.logprobs_seq[n], lp_top)
                    ]}
                n += 1
                if delta or lp is not None:
                    await resp.write(
                        chat_chunk(cid, self.model_name, {"content": delta},
                                   logprobs=lp).encode()
                    )
                if stopped:
                    self.async_engine.engine.cancel(req, "stop")
                    finish = "stop"
                    break
            if fin:
                finish = req.finish_reason or "stop"
        if scan.hit is None:
            tail = scan.flush()
            if tail:
                await resp.write(
                    chat_chunk(cid, self.model_name, {"content": tail}).encode()
                )
        await resp.write(chat_chunk(cid, self.model_name, {}, finish).encode())
        if usage:
            payload = {
                "id": cid, "object": "chat.completion.chunk",
                "created": int(time.time()), "model": self.model_name,
                "choices": [],
                "usage": {
                    "prompt_tokens": len(ids),
                    "completion_tokens": n,
                    "total_tokens": len(ids) + n,
                },
            }
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def _stream_completion(self, request, cid, ids, sampling, openai: bool,
                                 stops=None, lp_top=None, echo_text=None,
                                 usage=False):
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        if echo_text:  # OpenAI `echo`: the prompt leads the stream
            first = {
                "id": cid, "object": "text_completion", "model": self.model_name,
                "choices": [{"index": 0, "text": echo_text, "logprobs": None,
                             "finish_reason": None}],
            }
            await resp.write(f"data: {json.dumps(first)}\n\n".encode())
        detok = _Detokenizer(self.tokenizer)
        scan = _StopScan(stops)
        n = 0
        cur_lp = [None, None]  # (token, logprobs_seq entry) for this chunk

        def payload_for(text, fin, reason):
            if openai:
                lp = None
                if lp_top and cur_lp[1] is not None:
                    lp = self._lp_chunk_openai(cur_lp[0], cur_lp[1], lp_top)
                return {
                    "id": cid, "object": "text_completion", "model": self.model_name,
                    "choices": [{"index": 0, "text": text,
                                 "logprobs": lp,
                                 "finish_reason": reason if fin else None}],
                }
            p = {"content": text, "stop": bool(fin), "tokens_predicted": n}
            if lp_top and cur_lp[1] is not None:
                _, tops = cur_lp[1]
                import math

                p["completion_probabilities"] = [{
                    "content": self._tok_str(cur_lp[0]),
                    "probs": [
                        {"tok_str": self._tok_str(t), "prob": math.exp(v)}
                        for t, v in tops[:lp_top]
                    ],
                }]
            if fin and scan.hit is not None:
                p["stopped_word"] = True
                p["stopping_word"] = scan.hit
            return p

        async for tok, fin, req in self.async_engine.generate_stream(ids, sampling):
            if tok >= 0:
                cur_lp = (
                    [tok, req.logprobs_seq[n]]
                    if lp_top and n < len(req.logprobs_seq)
                    else [None, None]
                )
                delta, stopped = scan.push(detok.push(tok))
                n += 1
                if stopped:
                    self.async_engine.engine.cancel(req, "stop")
                    await resp.write(
                        f"data: {json.dumps(payload_for(delta, True, 'stop'))}\n\n".encode()
                    )
                    break
                if fin:  # release any held-back tail with the final chunk
                    delta += scan.flush()
                await resp.write(
                    f"data: {json.dumps(payload_for(delta, fin, req.finish_reason))}\n\n".encode()
                )
            elif fin:
                cur_lp = [None, None]
                await resp.write(
                    f"data: {json.dumps(payload_for(scan.flush(), True, req.finish_reason or 'stop'))}\n\n".encode()
                )
        if openai:
            if usage:  # stream_options.include_usage: final usage chunk
                payload = {
                    "id": cid, "object": "text_completion",
                    "created": int(time.time()), "model": self.model_name,
                    "choices": [],
                    "usage": {
                        "prompt_tokens": len(ids),
                        "completion_tokens": n,
                        "total_tokens": len(ids) + n,
                    },
                }
                await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


def build_app(server: InferenceServer) -> web.Application:
    app = web.Application()
    app.add_routes(
        [
            web.get("/health", server.health),
            web.get("/v1/models", server.models),
            web.get("/stats", server.stats),
            web.get("/props", server.props),
            web.get("/slots", server.slots),
            web.get("/metrics", server.metrics),
            web.post("/admin/snapshot", server.admin_snapshot),
            web.post("/admin/restore", server.admin_restore),
            web.post("/admin/reset-cache", server.admin_reset_cache),
            web.post("/v1/chat/completions", server.chat_completions),
            web.post("/v1/completions", server.completions),
            web.post("/completion", server.llamacpp_completion),
            web.post("/v1/embeddings", server.embeddings),
            web.post("/embedding", server.llamacpp_embedding),
            web.post("/tokenize", server.tokenize),
            web.post("/detokenize", server.detokenize),
        ]
    )
    return app


def create_server(
    model_path: Optional[str] = None,
    *,
    tiny: bool = False,
    engine_config: Optional[EngineConfig] = None,
    use_pallas: Optional[bool] = None,
    tp: int = 1,
    dp: int = 1,
    tokenizer_path: Optional[str] = None,
    long_context: bool = False,
    attn_window: int = 0,
    attn_global_tokens: int = 0,
) -> InferenceServer:
    """tp > 1 runs the engine tensor-parallel over the first tp devices
    (parallel/sharding.py layout). dp > 1 spawns dp engine replicas
    (each optionally TP over its own device slice; replica r uses
    devices [r*tp, (r+1)*tp)) behind a least-loaded router — DP is
    absent in the reference (SURVEY.md §2.3), designed fresh. With
    fewer devices than replicas the replicas share devices (testing
    configuration; weights are shared, KV pools are per-replica).
    `model_path` may be an HF/wf-packed directory or an i2_s .gguf file
    (pass `tokenizer_path` for GGUF — the wf GGUF carries no
    tokenizer)."""
    from ..models.bitnet import init_params
    from ..models.loader import load_params, load_tokenizer

    if dp < 1:
        raise ValueError(f"dp must be >= 1, got {dp}")
    mesh = None
    if tp > 1:
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(1, tp)

    if tiny:
        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        # a real tokenizer dir may still be supplied (tokenizer-json
        # end-to-end tests; vocab must fit the tiny config)
        tokenizer = (
            load_tokenizer(tokenizer_path) if tokenizer_path else ByteTokenizer()
        )
        ecfg = engine_config or EngineConfig(
            max_batch_slots=4, page_size=8, num_pages=256, max_context=256,
            prefill_buckets=(16, 64, 128),
        )
        name = "wrinklefree-tiny-test"
    elif str(model_path or "").startswith("synth:"):
        # synthetic random-weight model at real geometry (benchmarks:
        # cold-boot/TTFT measurement needs the true 2B compile+init cost
        # and throughput is value-independent; no egress on this box)
        kind = str(model_path).split(":", 1)[1]
        cfg = getattr(BitNetConfig, kind)()
        params = init_params(cfg, seed=0)
        tokenizer = (
            load_tokenizer(tokenizer_path) if tokenizer_path else ByteTokenizer()
        )
        ecfg = engine_config or EngineConfig()
        name = str(model_path)
    else:
        assert model_path, "--model required unless --tiny"
        if str(model_path).endswith(".gguf"):
            from ..convert.gguf import load_params_gguf

            params, cfg = load_params_gguf(model_path)
            assert tokenizer_path, "--tokenizer required for .gguf models"
            tokenizer = load_tokenizer(tokenizer_path)
        else:
            params, cfg = load_params(model_path)
            tokenizer = load_tokenizer(tokenizer_path or model_path)
        ecfg = engine_config or EngineConfig()
        name = str(model_path)

    import dataclasses as _dc

    if use_pallas is not None and engine_config is None:
        ecfg = _dc.replace(ecfg, use_pallas=use_pallas)
    if attn_window > 0:
        # page-skipping sliding-window serving (kv/paged.py); needs the
        # dual layout, which `auto` only picks on TPU with bf16 KV
        ecfg = _dc.replace(
            ecfg, attn_window=attn_window,
            attn_global_tokens=attn_global_tokens,
            kv_layout="layer" if ecfg.kv_layout == "auto" else ecfg.kv_layout,
        )
    eos = getattr(tokenizer, "eos_token_id", None)
    lc_mesh = None
    if long_context:
        # sequence-parallel ring path for beyond-max_context requests
        # (engine/long_context.py); all local devices form the seq axis
        import jax
        import numpy as _np

        lc_mesh = jax.sharding.Mesh(_np.asarray(jax.devices()), ("seq",))
    if dp == 1:
        engine = Engine(params, cfg, ecfg, eos_token_id=eos, mesh=mesh,
                        long_context_mesh=lc_mesh)
        return InferenceServer(engine, tokenizer, name)

    import jax

    devs = jax.devices()
    engines = []
    for r in range(dp):
        mesh_r = None
        params_r = params
        if tp > 1:
            from ..parallel.sharding import make_mesh

            lo = r * tp
            if lo + tp <= len(devs):
                mesh_r = make_mesh(1, tp, devices=devs[lo:lo + tp])
            else:  # not enough devices: replicas share the first slice
                mesh_r = make_mesh(1, tp)
        elif r < len(devs) and len(devs) >= dp:
            # one replica per device: explicit weight copy (DP semantics)
            params_r = jax.device_put(params, devs[r])
        engines.append(Engine(
            params_r, cfg, ecfg, eos_token_id=eos, mesh=mesh_r,
            long_context_mesh=lc_mesh if r == 0 else None,
        ))
    return InferenceServer(engines, tokenizer, name)


def main(argv=None):
    p = argparse.ArgumentParser("wrinklefree-tpu server")
    p.add_argument("--model", default=None,
                   help="model directory (HF or packed) or i2_s .gguf file")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer directory (required for .gguf models)")
    p.add_argument("--tiny", action="store_true", help="tiny random model (testing)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--num-pages", type=int, default=2048)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--max-context", type=int, default=4096)
    p.add_argument("--kv-dtype", default="bf16",
                   choices=["bf16", "fp16", "f32", "int8", "fp8_e4m3", "fp8_e5m2"])
    p.add_argument("--no-radix", action="store_true")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over local devices")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel engine replicas behind a "
                        "least-loaded router (each replica optionally "
                        "TP over its own device slice)")
    p.add_argument("--long-context", action="store_true",
                   help="serve prompts beyond max-context via the "
                        "sequence-parallel ring-attention path (greedy)")
    p.add_argument("--window", type=int, default=0,
                   help="sliding-window attention width: pages outside "
                        "[pos-window, pos] are never gathered, so "
                        "attention read bytes scale with window instead "
                        "of context (approximate beyond the window)")
    p.add_argument("--global-tokens", type=int, default=0,
                   help="always-visible prefix length for --window "
                        "(Longformer-style globals)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile decode burst + prefill buckets at boot "
                        "(AOT lower+compile; pairs with "
                        "JAX_COMPILATION_CACHE_DIR so restarts reuse them)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu). The axon TPU "
                        "plugin ignores the JAX_PLATFORMS env var, so the "
                        "server mirrors it into the jax config API — "
                        "otherwise JAX_PLATFORMS=cpu subprocesses still "
                        "block on TPU-tunnel discovery")
    args = p.parse_args(argv)

    import os

    plat = args.platform or os.environ.get("JAX_PLATFORMS", "")
    if plat and plat not in ("axon", "tpu"):
        import jax

        jax.config.update("jax_platforms", plat)

    logging.basicConfig(level=logging.INFO)
    ecfg = None
    if args.model:
        ecfg = EngineConfig(
            max_batch_slots=args.max_batch,
            page_size=args.page_size,
            num_pages=args.num_pages,
            max_context=args.max_context,
            kv_dtype=args.kv_dtype,
            enable_radix_cache=not args.no_radix,
        )
    server = create_server(
        args.model, tiny=args.tiny, engine_config=ecfg,
        use_pallas=False if args.no_pallas else None, tp=args.tp,
        dp=args.dp, tokenizer_path=args.tokenizer,
        long_context=args.long_context, attn_window=args.window,
        attn_global_tokens=args.global_tokens,
    )
    if args.warmup:
        for e in server.async_engine.engines:
            # full=True compiles every page-bucket decode variant too:
            # the default left the first request paying a ~3 s compile
            # for its page bucket (cold-boot measurement, RESULTS.md)
            e.warmup(full=True)
    app = build_app(server)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
