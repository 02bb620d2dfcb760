"""Continuous-batching inference engine.

TPU-native re-design of the reference's SGLang scheduler (SURVEY.md §3.1):
the entire decode step — KV write, paged attention, 7 ternary matmuls x L
layers, sampling — is ONE jitted program over fixed batch slots with
donated KV pools. The host loop only moves int32 metadata (page tables,
seq lens), avoiding the reference's ~49 ms/token Python overhead
(reference docs/research/notebook.md:946-954).

Scheduling model:
  - fixed `max_batch_slots` decode slots; free slots admit queued requests
  - prefill runs chunked at bucketed lengths (one jit per bucket)
  - radix prefix cache reuses full KV pages across requests
  - page 0 is trash; inactive slots decode into it harmlessly
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import logging
import queue
import threading
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BitNetConfig, EngineConfig
from ..kv.paged import PagedKV, paged_forward
from ..ops.sampling import (
    apply_logit_bias,
    apply_penalties,
    per_request_keys,
    sample_token,
    sample_token_mirostat,
)
from .page_allocator import PageAllocator
from .radix_cache import RadixCache
from .sampling_params import SamplingParams

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Request:
    rid: int
    prompt_ids: List[int]
    sampling: SamplingParams
    on_token: Optional[Callable[[int, bool], None]] = None  # (token, finished)
    # runtime state
    output_ids: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    pages: List[int] = dataclasses.field(default_factory=list)  # owned pages
    matched_nodes: list = dataclasses.field(default_factory=list)
    matched_pages: List[int] = dataclasses.field(default_factory=list)
    matched_tokens: int = 0
    seq_len: int = 0
    pending: List[int] = dataclasses.field(default_factory=list)  # prompt tokens not yet prefilled
    # per emitted token, when sampling.logprobs_k > 0:
    # (chosen_logprob, [(token_id, logprob), ...] top-k) — appended
    # BEFORE on_token fires so stream consumers can read it
    logprobs_seq: List[tuple] = dataclasses.field(default_factory=list)
    # sampling-stream offset for requests resumed from a snapshot: the
    # per-request RNG key is fold_in(seed, counter_base + #sampled)
    counter_base: int = 0
    seed: int = 0  # per-request RNG stream (sampling.seed or derived from rid)
    finished: bool = False
    finish_reason: str = ""
    arrival_t: float = dataclasses.field(default_factory=time.monotonic)
    first_token_t: Optional[float] = None
    finish_t: Optional[float] = None
    # incremental grammar state for json_mode (JsonPrefixValidator over
    # emitted text so far); created at admission
    grammar: object = None


class Engine:
    def __init__(
        self,
        params,
        cfg: BitNetConfig,
        ecfg: EngineConfig | None = None,
        *,
        eos_token_id: Optional[int] = None,
        linear_fn=None,
        attention_fn=None,
        mesh=None,
        long_context_mesh=None,
    ):
        """With ``mesh`` (axes ('data','model'), data=1) the engine runs
        tensor-parallel: params are TP-repacked/sharded and every jitted
        program is a shard_map over the mesh (BASELINE config 4 — e.g.
        Llama-3-8B ternary TP on one host).

        With ``long_context_mesh`` (1-axis mesh named 'seq'), prompts
        exceeding max_context fall back to the sequence-parallel
        ring-attention path (engine/long_context.py) in generate()
        instead of raising."""
        self.params = params
        self._long_ctx_mesh = long_context_mesh
        self._long_ctx_params = params  # unfused snapshot for the ring path
        self._long_ctx = None
        self.cfg = cfg
        self.ecfg = ecfg or EngineConfig()
        self.mesh = mesh
        self._tp_kv_rep = False  # set under mesh init below
        if self.ecfg.exact_head_k and self.ecfg.int8_logits:
            raise ValueError(
                "int8_logits (approximate) and exact_head_k (exact) "
                "are mutually exclusive"
            )
        if self.ecfg.int8_logits or self.ecfg.exact_head_k:
            # quantize BEFORE TP sharding: per-row absmax commutes with
            # the vocab-row shard, so the int8 head shards like `embed`
            from ..models.bitnet import quantize_lm_head

            self.params = quantize_lm_head(self.params, cfg)
        if mesh is not None:
            from ..parallel.sharding import repack_params_for_tp, shard_params

            tp = mesh.shape["model"]
            if cfg.num_experts > 0 and cfg.num_experts % tp:
                raise ValueError(
                    f"num_experts {cfg.num_experts} not divisible by tp={tp} "
                    "(the model axis doubles as the EP axis for MoE)"
                )
            from ..parallel.sharding import tp_kv_replicated

            # raises when tp cannot split the Q heads; True -> replicate
            # KV heads/pools (flagship 20q/5kv geometry on tp=2/4)
            self._tp_kv_rep = tp_kv_replicated(cfg, tp)
            if self.params["embed"].shape[0] % tp:
                raise ValueError(
                    f"vocab {self.params['embed'].shape[0]} not divisible by tp={tp}"
                )
            self.params = shard_params(
                repack_params_for_tp(self.params, tp), mesh,
                kv_replicated=self._tp_kv_rep,
            )
        self.eos_token_id = eos_token_id
        use_pallas = self.ecfg.use_pallas
        if use_pallas is None:
            # measured (warm compile caches, session 2): the stacked+fused
            # Pallas path beats the XLA-fused path at every batch size —
            # 2B serving 2063 vs 1754 decode tok/s at 16 slots, 2.6x at
            # batch 1. (The earlier "XLA wins at batch >= 8" conclusion
            # was compile-pollution in the measurement.)
            use_pallas = jax.devices()[0].platform == "tpu"
        if linear_fn is None and use_pallas:
            if mesh is None and cfg.num_experts == 0:
                # fused projections (7 -> 4 Pallas calls/layer) + in-kernel
                # norm/quant/activation prologues. TP shards by head so
                # fused column groups would split incorrectly — single-
                # device only.
                from ..models.bitnet import fuse_projections
                from ..ops.ternary_pallas import make_pallas_linear_fused

                linear_fn = make_pallas_linear_fused()
                self.params = fuse_projections(self.params, cfg)
            else:
                from ..ops.ternary_pallas import make_pallas_linear_stacked

                linear_fn = make_pallas_linear_stacked()
        self._linear_fn = linear_fn
        # prefill may use a different linear path than decode (prefill
        # GEMM shapes are MXU-bound where decode is bandwidth-bound);
        # "auto" keeps one path, env WF_PREFILL_LINEAR overrides
        import os as _os0

        plin = self.ecfg.prefill_linear
        if plin == "auto":
            plin = _os0.environ.get("WF_PREFILL_LINEAR", "auto")
        if plin == "xla" and getattr(linear_fn, "stacked", False):
            from ..ops.ternary import make_xla_linear_stacked

            self._prefill_linear_fn = make_xla_linear_stacked()
        else:
            self._prefill_linear_fn = linear_fn
        self._attention_fn = attention_fn

        e = self.ecfg
        self.page_size = e.page_size
        # power-of-two table width: _pages_bucket slices must stay pow2
        # so history token counts remain 128-multiples (the flash-prefill
        # tiling condition) — a ragged width silently dropped every
        # long-context prefill onto the materializing jnp oracle
        need = -(-e.max_context // e.page_size)
        self.max_pages_per_seq = 8
        while self.max_pages_per_seq < need:
            self.max_pages_per_seq *= 2

        import os as _os

        # in-place Pallas KV writer on TPU for unquantized pools (the XLA
        # scatter copies the whole pool); WF_KV_WRITE=xla overrides
        self._kv_write = "xla"
        if (
            _os.environ.get("WF_KV_WRITE", "auto") != "xla"
            and jax.devices()[0].platform == "tpu"
            and e.kv_dtype in ("bf16", "f32", "fp16")
        ):
            self._kv_write = "pallas"

        layout = e.kv_layout
        if layout == "auto":
            layout = "layer" if self._kv_write == "pallas" else "token"
        self.kv_layout = layout
        if layout == "layer":
            # prefill chunks must start page-aligned: buckets become
            # multiples of page_size (paged._dual_write contract)
            ps = e.page_size
            self.ecfg = e = dataclasses.replace(
                e,
                prefill_buckets=tuple(
                    sorted({-(-b // ps) * ps for b in e.prefill_buckets})
                ),
            )
            self.pools = PagedKV.zeros_dual(
                cfg, e.num_pages, e.page_size, e.max_batch_slots, e.kv_dtype
            )
        else:
            self.pools = PagedKV.zeros(cfg, e.num_pages, e.page_size, e.kv_dtype)
        if mesh is not None:
            from ..parallel.sharding import put_sharded

            ps_spec = self._pool_spec()
            self.pools = PagedKV(
                put_sharded(self.pools.kv, mesh, ps_spec.kv),
                None
                if self.pools.scale is None
                else put_sharded(self.pools.scale, mesh, ps_spec.scale),
                None
                if self.pools.staging is None
                else put_sharded(self.pools.staging, mesh, ps_spec.staging),
                None
                if self.pools.staging_scale is None
                else put_sharded(
                    self.pools.staging_scale, mesh, ps_spec.staging_scale
                ),
            )
        if self._attention_fn is None and e.attn_window > 0:
            # sliding-window serving attention: page-skipping gather on
            # the dual layout (kv/paged.make_dual_window_attention) —
            # attention READ bytes scale with window, not context
            if not self.pools.dual:
                raise ValueError(
                    "attn_window requires the dual KV layout "
                    "(kv_layout 'layer', or 'auto' on TPU with "
                    "unquantized KV)"
                )
            from ..kv.paged import make_dual_window_attention

            self._attention_fn = make_dual_window_attention(
                e.attn_window, e.attn_global_tokens
            )
        # Host bookkeeping hot path: native C++ runtime when it builds,
        # pure-Python oracle otherwise (same fallback pattern as the
        # reference's native kernels, kernels/bitnet_patch.py:22-25).
        self.native_runtime = False
        if e.use_native_runtime:
            try:
                from ..native import NativePageAllocator, NativeRadixCache

                self.allocator = NativePageAllocator(e.num_pages)
                self.radix = (
                    NativeRadixCache(self.allocator, e.page_size)
                    if e.enable_radix_cache
                    else None
                )
                self.native_runtime = True
            except Exception:
                pass
        if not self.native_runtime:
            self.allocator = PageAllocator(e.num_pages)
            self.radix = (
                RadixCache(self.allocator, e.page_size)
                if e.enable_radix_cache
                else None
            )

        S = e.max_batch_slots
        self.page_table = np.zeros((S, self.max_pages_per_seq), np.int32)
        self.seq_lens = np.zeros((S,), np.int32)
        self.slots: List[Optional[Request]] = [None] * S
        self.last_tokens = np.zeros((S,), np.int32)
        self.slot_seeds = np.zeros((S,), np.uint32)
        self.slot_counters = np.zeros((S,), np.int32)
        self.slot_temps = np.zeros((S,), np.float32)
        self.slot_tps = np.ones((S,), np.float32)
        self.slot_topks = np.zeros((S,), np.int32)
        self.slot_minps = np.zeros((S,), np.float32)
        # penalty state: identity defaults + last-W token ring per slot
        self.slot_reps = np.ones((S,), np.float32)
        self.slot_pres = np.zeros((S,), np.float32)
        self.slot_freqs = np.zeros((S,), np.float32)
        self.slot_lastn = np.zeros((S,), np.int32)
        self.slot_typps = np.ones((S,), np.float32)
        self.slot_tfs = np.ones((S,), np.float32)
        self.slot_miro = np.zeros((S,), np.int32)
        self.slot_mtau = np.full((S,), 5.0, np.float32)
        self.slot_meta = np.full((S,), 0.1, np.float32)
        self.slot_mu = np.zeros((S,), np.float32)  # mirostat state (2*tau)
        self._mu_fresh = set()  # slots whose mu was (re)initialized
        Kb = e.logit_bias_slots
        self.slot_bias_ids = np.full((S, Kb), -1, np.int32)
        self.slot_bias_vals = np.zeros((S, Kb), np.float32)
        # device-resident copies of the scheduling state (uploaded lazily;
        # page_table sliced to the active-history bucket)
        self._dstate = None
        self._dstate_cand = None  # constrained-rows view (segregated decode)
        self._mp_bucket = 0
        self._dirty = True

        self.waiting: "queue.Queue[Request]" = queue.Queue(maxsize=e.max_queue)
        self._backlog: List[Request] = []  # drained from `waiting`, policy-ordered
        self._rid = itertools.count()
        self._lock = threading.Lock()

        self._decode_jit = self._build_decode()
        # shorter-burst variants (K/2, K/4, ... >= 8), built lazily:
        # when every active slot needs fewer than decode_burst more
        # tokens, a full burst wastes the tail steps (up to half the
        # decode compute at e.g. 32-new-token requests under K=64 —
        # the radix/llama/moe serving scenarios). The dispatcher picks
        # the smallest bucket covering the max remaining budget.
        self._decode_jits_k: Dict[int, Callable] = {}
        self._decode_lp_jit = None  # built lazily (first logprobs request)
        self._decode_spec_jit = None  # built lazily (speculative_k > 0)
        self._decode_cand_jit = None  # built lazily (first json_mode request)
        self._decode_miro_jit = None  # built lazily (first mirostat request)
        # id -> decoded text piece, set by the embedder (server) before
        # json_mode requests can run; engine tests set it directly
        self.token_pieces: "Optional[List[str]]" = None
        self._dhist = None
        self._prefill_jits: Dict[int, Callable] = {}

        # metrics
        self.stats = {"decode_steps": 0, "decode_tokens": 0, "prefill_tokens": 0,
                      "radix_hit_tokens": 0, "requests": 0}
        # rolling (ttft_s, e2e_s, n_tokens) of the last 512 finished
        # requests — the reference's BenchmarkMetrics percentile schema
        # (legacy/benchmark/metrics.py), kept live instead of offline
        import collections

        self.latency_log = collections.deque(maxlen=512)

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _pool_spec(self):
        from .programs import pool_spec

        return pool_spec(self)

    def _build_decode(self, with_logprobs: bool = False,
                      return_logits: bool = False,
                      with_mirostat: bool = False):
        """Build the fused K-step decode burst (engine/programs.py)."""
        from .programs import build_decode

        return build_decode(self, with_logprobs=with_logprobs,
                            return_logits=return_logits,
                            with_mirostat=with_mirostat)

    def _build_decode_spec(self):
        """Build the speculative decode burst (engine/programs.py)."""
        from .programs import build_decode_spec

        return build_decode_spec(self)

    def _prefill_for_bucket(self, bucket: int, with_logprobs: bool = False,
                            return_logits: bool = False):
        """Bucketed prefill program, cached per variant (engine/programs.py)."""
        from .programs import prefill_for_bucket

        return prefill_for_bucket(self, bucket, with_logprobs=with_logprobs,
                                  return_logits=return_logits)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _validate_submit(self, prompt_ids, sampling: SamplingParams):
        limit = self.ecfg.max_context
        if len(prompt_ids) >= limit:
            raise ValueError(
                f"prompt too long: {len(prompt_ids)} >= max_context {limit}"
            )
        if sampling.logit_bias and len(sampling.logit_bias) > self.ecfg.logit_bias_slots:
            raise ValueError(
                f"logit_bias has {len(sampling.logit_bias)} entries; "
                f"engine supports {self.ecfg.logit_bias_slots} "
                "(EngineConfig.logit_bias_slots)"
            )
        if sampling.constrained:
            if self.token_pieces is None:
                raise ValueError(
                    "constrained decoding (json_mode/grammar) requires "
                    "Engine.token_pieces (id -> decoded text) to be set"
                )
            if sampling.logprobs_k > 0:
                raise ValueError(
                    "constrained decoding with logprobs not supported"
                )
            if sampling.grammar and not sampling.json_mode:
                from .gbnf import GbnfValidator

                GbnfValidator(sampling.grammar)  # raises on parse errors
            if sampling.mirostat:
                raise ValueError(
                    "mirostat with constrained decoding not supported"
                )
        if sampling.mirostat and sampling.logprobs_k > 0:
            raise ValueError("mirostat with logprobs not supported")

    def submit(
        self,
        prompt_ids: List[int],
        sampling: SamplingParams | None = None,
        on_token: Optional[Callable[[int, bool], None]] = None,
    ) -> Request:
        sampling = sampling or SamplingParams()
        self._validate_submit(prompt_ids, sampling)
        req = Request(next(self._rid), list(prompt_ids), sampling, on_token)
        req.seed = (
            sampling.seed
            if sampling.seed is not None
            else ((req.rid + 1) * 2654435761) % (2**32)
        )
        self.waiting.put(req, timeout=5)
        self.stats["requests"] += 1
        return req

    def generate(
        self, prompt_ids: List[int], sampling: SamplingParams | None = None
    ) -> Request:
        """Synchronous convenience: run the loop until this request finishes.

        Prompts beyond max_context are served via the sequence-parallel
        ring-attention path when ``long_context_mesh`` was given
        (greedy-only; VERDICT r1 item 9)."""
        sampling = sampling or SamplingParams()
        if (
            len(prompt_ids) >= self.ecfg.max_context
            and self._long_ctx_mesh is not None
        ):
            if sampling.temperature > 0:
                raise ValueError("long-context ring path is greedy-only")
            if self._long_ctx is None:
                from .long_context import LongContextEngine

                self._long_ctx = LongContextEngine(
                    self._long_ctx_params, self.cfg, self._long_ctx_mesh
                )
            out = self._long_ctx.generate(
                list(prompt_ids), sampling.max_new_tokens,
                eos_token_id=self.eos_token_id,
            )
            req = Request(next(self._rid), list(prompt_ids), sampling, None)
            req.output_ids = out
            req.finished = True
            req.finish_reason = (
                "stop" if out and out[-1] == self.eos_token_id else "length"
            )
            self.stats["requests"] += 1
            return req
        req = self.submit(prompt_ids, sampling)
        while not req.finished:
            if not self.step():
                time.sleep(0.001)
        return req

    def has_work(self) -> bool:
        return (
            not self.waiting.empty()
            or bool(self._backlog)
            or any(s is not None for s in self.slots)
        )

    def prefix_match_len(self, prompt_ids) -> int:
        """Length (tokens) of this engine's cached radix prefix for the
        prompt — read-only probe for cache-aware DP routing
        (parallel/router.py). 0 without a radix cache."""
        if self.radix is None:
            return 0
        with self._lock:
            matched, _pages, _nodes = self.radix.match(list(prompt_ids))
        return matched

    # ------------------------------------------------------------------
    # preemption: snapshot / restore
    # ------------------------------------------------------------------

    def snapshot(self) -> dict:
        """Preemption-safe state capture (engine/snapshot.py)."""
        from .snapshot import snapshot

        return snapshot(self)

    def restore(self, snap: dict, on_token_factory=None) -> List[Request]:
        """Resubmit a snapshot's requests (engine/snapshot.py)."""
        from .snapshot import restore

        return restore(self, snap, on_token_factory)

    # ------------------------------------------------------------------
    # scheduling
    # ------------------------------------------------------------------

    def step(self) -> bool:
        """One engine iteration: admit new requests (host-side setup
        only), run ONE batched prefill round (one chunk for EVERY
        mid-prefill slot in a single dispatch), then one decode burst
        for fully-prefilled slots. Chunked prefill and decode interleave
        at chunk granularity, so a long prompt no longer stalls decode
        for its entire prefill (the reference's scheduler has the same
        interleaving goal, SURVEY.md §2.3 continuous batching)."""
        with self._lock:
            did = self._admit()
            did = self._prefill_round() or did
            if not self.ecfg.interleave_prefill:
                while self._prefill_round():
                    pass
            did = self._decode() or did
            return did

    def _alloc_pages(self, n: int) -> List[int]:
        if n == 0:
            return []
        if self.allocator.num_free < n and self.radix is not None:
            self.radix.evict(n - self.allocator.num_free)
        return self.allocator.alloc(n)

    def _next_waiting(self) -> Optional[Request]:
        """Pop the next request per the admission policy. `fifo` is
        arrival order; `sjf` (shortest-job-first by prefill cost =
        unmatched prompt length) cuts mean TTFT under mixed prompt
        lengths, with an aging bound so long prompts can't starve
        (scale-aware admission — SURVEY.md §5.3 lists this as absent in
        the reference; designed fresh)."""
        while True:
            try:
                self._backlog.append(self.waiting.get_nowait())
            except queue.Empty:
                break
        if not self._backlog:
            return None
        if self.ecfg.admission_policy == "sjf":
            now = time.monotonic()
            aged = [r for r in self._backlog
                    if now - r.arrival_t > self.ecfg.admission_aging_s]
            if aged:  # anti-starvation: oldest aged request wins outright
                req = min(aged, key=lambda r: r.arrival_t)
            else:
                req = min(self._backlog, key=lambda r: (len(r.prompt_ids), r.rid))
        else:
            req = self._backlog[0]
        self._backlog.remove(req)
        return req

    def _requeue(self, req: Request):
        self._backlog.insert(0, req)

    def _admit(self) -> bool:
        did = False
        cap = self.ecfg.max_prefill_slots
        for slot in range(len(self.slots)):
            if self.slots[slot] is not None:
                continue
            if cap is not None and sum(
                1 for r in self.slots if r is not None and r.pending
            ) >= cap:
                # decode-slot reservation: under sustained admission
                # pressure, keep some slots decoding instead of turning
                # the whole batch into prefill waves (SURVEY.md §2.3
                # continuous batching; roadmap refinement)
                break
            req = self._next_waiting()
            if req is None:
                break
            try:
                self._start_request(slot, req)
                did = True
            except MemoryError:
                # If nothing is running and nothing is cached, no pages will
                # ever free up — the request can never fit: reject it.
                busy = any(s is not None for s in self.slots)
                cached = self.radix is not None and self.radix.num_cached_pages > 0
                if not busy and not cached:
                    req.finish_reason = "oom"
                    req.finished = True
                    if req.on_token is not None:
                        req.on_token(-1, True)
                    logger.warning("rejecting request %d: needs more KV pages than exist", req.rid)
                else:
                    self._requeue(req)  # retry when pages free up
                break
        return did

    def _start_request(self, slot: int, req: Request):
        ps = self.page_size
        # preempted/continued requests re-prefill generated-so-far too:
        # the emitted tokens are part of the KV stream (restore() folds
        # them into the prompt externally; in-engine retraction keeps
        # the same Request object, so fold here)
        src = req.prompt_ids + req.output_ids
        remaining_new = max(1, req.sampling.max_new_tokens - len(req.output_ids))
        total_budget = min(len(src) + remaining_new, self.ecfg.max_context)
        pages_needed_total = -(-total_budget // ps)
        if pages_needed_total > self.max_pages_per_seq:
            pages_needed_total = self.max_pages_per_seq

        matched = 0
        matched_pages: List[int] = []
        nodes = []
        if self.radix is not None:
            matched, matched_pages, nodes = self.radix.match(src)
            # never match the full prompt: at least one token must run
            while matched >= len(src) and nodes:
                nodes.pop()
                matched_pages.pop()
                matched -= ps
            self.radix.lock(nodes)
            self.stats["radix_hit_tokens"] += matched

        own_needed = pages_needed_total - len(matched_pages)
        try:
            own_pages = self._alloc_pages(max(own_needed, 0))
        except MemoryError:
            if self.radix is not None:
                self.radix.unlock(nodes)
            raise

        req.slot = slot
        req.pages = own_pages
        req.matched_nodes = nodes
        req.matched_pages = matched_pages
        req.matched_tokens = matched
        req.seq_len = matched
        req.pending = list(src[matched:])
        all_pages = matched_pages + own_pages

        row = np.zeros((self.max_pages_per_seq,), np.int32)
        row[: len(all_pages)] = all_pages
        self.page_table[slot] = row
        self.seq_lens[slot] = matched
        self.slots[slot] = req
        self.slot_seeds[slot] = req.seed
        # counter = counter_base + #sampled-so-far: a retracted request
        # resumes its seeded sampling stream exactly where it left off
        self.slot_counters[slot] = req.counter_base + len(req.output_ids)
        self.slot_temps[slot] = req.sampling.temperature
        self.slot_tps[slot] = req.sampling.top_p
        s = req.sampling
        self.slot_topks[slot] = max(0, s.top_k)
        self.slot_minps[slot] = max(0.0, s.min_p)
        self.slot_typps[slot] = s.typical_p
        self.slot_tfs[slot] = s.tfs_z
        self.slot_miro[slot] = s.mirostat
        self.slot_mtau[slot] = s.mirostat_tau
        self.slot_meta[slot] = s.mirostat_eta
        self.slot_mu[slot] = 2.0 * s.mirostat_tau
        self._mu_fresh.add(slot)
        self.slot_reps[slot] = s.repetition_penalty
        self.slot_pres[slot] = s.presence_penalty
        self.slot_freqs[slot] = s.frequency_penalty
        W = self.ecfg.penalty_window
        ln = s.penalty_last_n
        self.slot_lastn[slot] = W if ln < 0 else min(ln, W)
        if s.constrained and req.grammar is None:
            req.grammar = self._make_validator(s)
            # restored/continued requests replay generated-so-far text
            for t in req.output_ids:
                req.grammar.advance(self.token_pieces[t])
        self.slot_bias_ids[slot] = -1
        self.slot_bias_vals[slot] = 0.0
        if s.logit_bias:
            for k, (tid, bv) in enumerate(s.logit_bias):
                self.slot_bias_ids[slot, k] = int(tid)
                self.slot_bias_vals[slot, k] = float(bv)
        self._dirty = True

    def _rematch_prefix(self, slot: int, req: Request) -> None:
        """Re-run the radix match for a row that has not written any KV
        yet (seq_len == matched_tokens) and adopt any longer cached
        prefix: lock the new nodes, release the superseded own pages,
        rebuild the page-table row. Token-identical — only WHO computes
        the shared prefix changes."""
        ps = self.page_size
        src = req.prompt_ids + req.output_ids
        matched, pages, nodes = self.radix.match(src)
        while matched >= len(src) and nodes:  # at least one token must run
            nodes.pop()
            pages.pop()
            matched -= ps
        if matched <= req.matched_tokens:
            return
        gained_pages = (matched - req.matched_tokens) // ps
        # defensive: never adopt more than the own pages we can release
        while gained_pages > len(req.pages) and nodes:
            nodes.pop()
            pages.pop()
            matched -= ps
            gained_pages -= 1
        if matched <= req.matched_tokens:
            return
        self.radix.lock(nodes)
        self.radix.unlock(req.matched_nodes)
        # own pages for the newly-covered slots are unwritten: release
        release = req.pages[:gained_pages]
        req.pages = req.pages[gained_pages:]
        self.allocator.release_all(release)
        self.stats["radix_hit_tokens"] += matched - req.matched_tokens
        req.matched_nodes = nodes
        req.matched_pages = pages
        req.matched_tokens = matched
        req.seq_len = matched
        req.pending = list(src[matched:])
        all_pages = pages + req.pages
        row = np.zeros((self.max_pages_per_seq,), np.int32)
        row[: len(all_pages)] = all_pages
        self.page_table[slot] = row
        self.seq_lens[slot] = matched
        self._dirty = True

    def _prefill_round(self) -> bool:
        """One batched prefill dispatch: the next chunk for EVERY
        mid-prefill slot at once. Rows are padded to a power-of-two
        batch (dummy rows write to the trash page / trash staging slot),
        so a 16-slot admission wave costs ~log2 variants of one program
        instead of 16 sequential dispatches (each dispatch->fetch round
        trip costs ~30 ms on tunnel transports)."""
        rows = [
            (i, r) for i, r in enumerate(self.slots)
            if r is not None and r.pending
        ]
        if not rows:
            return False
        # per-phase walls (host build / upload / dispatch / fetch+emit)
        # accumulate in stats so profile tools can decompose prefill
        # wall time (device-side was only ~18% of it on the 8x3968
        # chip profile — VERDICT r4 weak item 4)
        t_host = time.perf_counter()
        if self.radix is not None:
            # in-queue re-match: rows that haven't written any KV yet can
            # adopt prefix pages another row published since admission
            # (eager insert below). With staggered prefill this collapses
            # a shared-prefix admission wave from N full prefills to ~1 +
            # N-1 suffixes: row 0 finishes whole in round 1 and inserts;
            # the untouched rows re-match before their first chunk.
            for i, r in rows:
                if r.seq_len == r.matched_tokens:
                    self._rematch_prefix(i, r)
            rows = [(i, r) for i, r in rows if r.pending]
            if not rows:
                return False
        NS = len(self.slots)
        # group rows by their natural chunk bucket — padding every row to
        # the round's max bucket wastes up to max/min bucket compute when
        # pending lengths are skewed (radix hits leave tiny suffixes).
        # The group containing the OLDEST row runs first (no starvation).
        by_bucket: Dict[int, list] = {}
        for i, r in rows:
            by_bucket.setdefault(self._pick_bucket(len(r.pending)), []).append((i, r))
        oldest = min(rows, key=lambda ir: ir[1].arrival_t)
        budget = self.ecfg.max_prefill_tokens_per_round
        mode = self.ecfg.prefill_round_mode
        if mode == "stagger":
            # depth-first (default): the oldest rows take the BIGGEST
            # bucket that fits their pending length within the round
            # budget; row count is capped by budget/bucket. Long prompts
            # finish whole in 1-2 rounds and start decoding while later
            # rows prefill — vs lockstep where all rows finish together
            # (13.1 s TTFT p50 on 8x3968 — VERDICT r3 item 2). Chunk
            # boundaries don't affect outputs, so this is token-identical
            # to the other modes. Same total dispatches: fewer rows/round
            # x proportionally bigger chunks.
            bucket = self._pick_bucket(min(len(oldest[1].pending), budget))
            nrows = max(1, budget // bucket)
            rows_sorted = sorted(rows, key=lambda ir: (ir[1].arrival_t, ir[0]))
            if self.radix is not None:
                # same-wave prefix sharing: a row that shares its FIRST
                # pending page with an earlier-selected row is deferred
                # this round — the leader's eager insert publishes the
                # prefix and the follower adopts it via _rematch_prefix
                # (1 full prefill + N-1 suffixes instead of N fulls;
                # without this, full-wave admission put all same-prefix
                # rows in ONE round and nobody could share). Followers
                # only defer while they can still re-match (no KV
                # written); if the leader dies the group's next row
                # leads the following round — no deadlock, and the
                # oldest row always advances.
                ps = self.page_size
                seen, sel = set(), []
                for i, r in rows_sorted:
                    key = (
                        tuple(r.pending[:ps])
                        if r.seq_len == r.matched_tokens
                        and len(r.pending) >= ps
                        else None
                    )
                    if key is not None and key in seen:
                        continue
                    if key is not None:
                        seen.add(key)
                    sel.append((i, r))
                    if len(sel) >= nrows:
                        break
                rows = sel
            else:
                rows = rows_sorted[:nrows]
        else:
            bucket = self._pick_bucket(len(oldest[1].pending))
            if mode == "all":
                # every mid-prefill row advances each round at the oldest
                # row's bucket width (short rows pad, long rows take a
                # bucket-sized chunk): more padding compute, ~half the
                # dispatches — wins when round trips dominate (tunnel
                # transports pay ~30 ms per dispatch; see RESULTS.md)
                pass
            else:  # "bucket": only the oldest row's bucket group
                rows = by_bucket[bucket]
        # bound the round's write transients: shrink the bucket until
        # rows x bucket fits the budget (never below the smallest bucket)
        while (
            len(rows) * bucket > budget
            and bucket > self.ecfg.prefill_buckets[0]
        ):
            smaller = [b for b in self.ecfg.prefill_buckets if b < bucket]
            bucket = smaller[-1]
        chunks = [(i, r, r.pending[:bucket]) for i, r in rows]
        B = 1
        while B < len(chunks):
            B *= 2
        mp_pre = self._pages_bucket(
            max(r.seq_len + len(c) + 1 for _, r, c in chunks)
        )

        toks = np.zeros((B, bucket), np.int32)
        pt = np.zeros((B, mp_pre), np.int32)
        seq = np.zeros((B,), np.int32)
        new = np.zeros((B,), np.int32)
        seeds = np.zeros((B,), np.uint32)
        ctrs = np.zeros((B,), np.int32)
        temps = np.ones((B,), np.float32)
        tps = np.ones((B,), np.float32)
        topks = np.zeros((B,), np.int32)
        minps = np.zeros((B,), np.float32)
        typps = np.ones((B,), np.float32)
        tfs = np.ones((B,), np.float32)
        sids = np.full((B,), NS, np.int32)  # dummy rows -> trash staging
        W = self.ecfg.penalty_window
        reps = np.ones((B,), np.float32)
        pres = np.zeros((B,), np.float32)
        freqs = np.zeros((B,), np.float32)
        lastn = np.zeros((B,), np.int32)
        ring = np.full((B, W), -1, np.int32)
        Kb = self.ecfg.logit_bias_slots
        bias_ids = np.full((B, Kb), -1, np.int32)
        bias_vals = np.zeros((B, Kb), np.float32)
        for j, (i, r, chunk) in enumerate(chunks):
            toks[j, : len(chunk)] = chunk
            pt[j] = self.page_table[i, :mp_pre]
            seq[j] = r.seq_len
            new[j] = len(chunk)
            seeds[j] = r.seed
            ctrs[j] = r.counter_base + len(r.output_ids)
            temps[j] = r.sampling.temperature
            tps[j] = r.sampling.top_p
            topks[j] = self.slot_topks[i]
            minps[j] = self.slot_minps[i]
            typps[j] = self.slot_typps[i]
            tfs[j] = self.slot_tfs[i]
            bias_ids[j] = self.slot_bias_ids[i]
            bias_vals[j] = self.slot_bias_vals[i]
            sids[j] = i
            if r.sampling.has_penalties:
                reps[j] = self.slot_reps[i]
                pres[j] = self.slot_pres[i]
                freqs[j] = self.slot_freqs[i]
                lastn[j] = self.slot_lastn[i]
                # window over the prompt as cached so far + this chunk
                stream = r.prompt_ids + r.output_ids
                n = r.seq_len + len(chunk)
                for p in range(max(0, n - W), min(n, len(stream))):
                    ring[j, p % W] = stream[p]

        want_lp = any(
            r.sampling.logprobs_k > 0 and len(r.pending) <= bucket
            for _, r, _ in chunks
        )
        want_cand = any(
            r.sampling.constrained and len(r.pending) <= bucket
            for _, r, _ in chunks
        )
        # a round mixing logprobs rows and json_mode rows uses the
        # full-logits variant; the logprobs entries are then computed
        # host-side from the same logits
        fn = self._prefill_for_bucket(
            bucket, with_logprobs=want_lp and not want_cand,
            return_logits=want_cand,
        )
        t_up = time.perf_counter()
        self.stats["prefill_host_s"] = self.stats.get(
            "prefill_host_s", 0.0) + (t_up - t_host)
        samp = {
            "temps": jnp.asarray(temps), "tps": jnp.asarray(tps),
            "topks": jnp.asarray(topks), "minps": jnp.asarray(minps),
            "typps": jnp.asarray(typps), "tfs": jnp.asarray(tfs),
            "reps": jnp.asarray(reps), "pres": jnp.asarray(pres),
            "freqs": jnp.asarray(freqs), "lastn": jnp.asarray(lastn),
            "bias_ids": jnp.asarray(bias_ids),
            "bias_vals": jnp.asarray(bias_vals),
            # mirostat applies from the first decode step; the prefill
            # sampler runs the standard chain (mu starts at 2*tau)
            "miro": jnp.zeros((B,), jnp.int32),
            "mtau": jnp.full((B,), 5.0, jnp.float32),
            "meta": jnp.full((B,), 0.1, jnp.float32),
        }
        args_d = (jnp.asarray(toks), jnp.asarray(pt), jnp.asarray(seq),
                  jnp.asarray(new), jnp.asarray(seeds), jnp.asarray(ctrs),
                  jnp.asarray(sids), jnp.asarray(ring))
        t_disp = time.perf_counter()
        self.stats["prefill_upload_s"] = self.stats.get(
            "prefill_upload_s", 0.0) + (t_disp - t_up)
        out, self.pools = fn(self.params, self.pools, *args_d, samp)
        t_fetch = time.perf_counter()
        self.stats["prefill_dispatch_s"] = self.stats.get(
            "prefill_dispatch_s", 0.0) + (t_fetch - t_disp)
        logits_np = None
        if want_cand:
            nxt, logits_d = out
            logits_np = np.asarray(logits_d)  # [B, V]
            lp_np = None
        elif want_lp:
            nxt, chosen_d, tids_d, tlps_d = out
            lp_np = (np.asarray(chosen_d), np.asarray(tids_d),
                     np.asarray(tlps_d))
        else:
            nxt, lp_np = out, None
        nxt_np = None
        for j, (i, r, chunk) in enumerate(chunks):
            r.pending = r.pending[len(chunk):]
            r.seq_len += len(chunk)
            self.seq_lens[i] = r.seq_len
            self.stats["prefill_tokens"] += len(chunk)
            if not r.pending:  # prompt fully cached: first sampled token
                if self.radix is not None:
                    # EAGER insert: publish the prompt's full pages now
                    # (not at finish) so queued same-wave rows can adopt
                    # them via _rematch_prefix. insert() skips existing
                    # chunks, so the finish-time insert stays a no-op
                    # for these pages.
                    fullp = r.seq_len // self.page_size
                    if fullp > 0:
                        src_r = r.prompt_ids + r.output_ids
                        self.radix.insert(
                            src_r[: fullp * self.page_size],
                            (r.matched_pages + r.pages)[:fullp],
                        )
                if nxt_np is None:
                    nxt_np = np.asarray(nxt)
                status = ""
                if r.sampling.constrained:
                    first_tok, status = self._select_constrained(
                        r, logits_np[j]
                    )
                    if first_tok is None:
                        self._finish_notify(r, "stop")
                        continue
                else:
                    first_tok = int(nxt_np[j])
                lp = None
                if r.sampling.logprobs_k > 0:
                    if lp_np is not None:
                        lp = (lp_np[0][j], lp_np[1][j], lp_np[2][j])
                    elif logits_np is not None:
                        # mixed round: logprobs from the full logits
                        row = logits_np[j].astype(np.float64)
                        lsm = row - (
                            row.max() + np.log(np.exp(row - row.max()).sum())
                        )
                        n = self.ecfg.logprobs_top
                        top = np.argsort(-lsm)[:n]
                        lp = (lsm[first_tok], top, lsm[top])
                self._emit_token(r, first_tok, lp)
                if not r.finished and status == "complete":
                    self._finish_notify(r, "stop")
                if not r.finished:
                    self.last_tokens[i] = first_tok
                self.slot_counters[i] = r.counter_base + len(r.output_ids)
        self.stats["prefill_fetch_emit_s"] = self.stats.get(
            "prefill_fetch_emit_s", 0.0) + (time.perf_counter() - t_fetch)
        self.stats["prefill_rounds"] = self.stats.get("prefill_rounds", 0) + 1
        self._dirty = True
        return True

    def _pick_bucket(self, n: int) -> int:
        for b in self.ecfg.prefill_buckets:
            if n <= b:
                return b
        return self.ecfg.prefill_buckets[-1]

    def _upload_state(self, mp: int):
        # Mid-prefill slots are masked out of decode bursts: zeroed page
        # table row (token writes land in the trash page), zeroed
        # seq/last, and staging slot NS (the trash staging page).
        NS = len(self.slots)
        pt = self.page_table[:, :mp].copy()
        sl = self.seq_lens.copy()
        last = self.last_tokens.copy()
        sids = np.arange(NS, dtype=np.int32)
        for i, r in enumerate(self.slots):
            if r is not None and r.pending:
                pt[i] = 0
                sl[i] = 0
                last[i] = 0
                sids[i] = NS
        # penalty ring: token at seq position p lives at ring[slot, p % W]
        # (reconstructed from request token streams on every upload — the
        # decode burst keeps it current on-device between uploads)
        W = self.ecfg.penalty_window
        ring = np.full((NS, W), -1, np.int32)
        for i, r in enumerate(self.slots):
            if r is None or r.pending:
                continue
            toks_all = r.prompt_ids + r.output_ids
            n = int(self.seq_lens[i])
            for p in range(max(0, n - W), min(n, len(toks_all))):
                ring[i, p % W] = toks_all[p]
        # mirostat mu evolves on-device between uploads: pull it back
        # for still-running slots (freshly admitted slots keep their
        # 2*tau initialization)
        if self._dstate is not None:
            dev_mu = np.asarray(self._dstate[8])
            for i in range(NS):
                if i not in self._mu_fresh:
                    self.slot_mu[i] = dev_mu[i]
        self._mu_fresh.clear()
        samp = {
            "temps": jnp.asarray(self.slot_temps),
            "tps": jnp.asarray(self.slot_tps),
            "topks": jnp.asarray(self.slot_topks),
            "minps": jnp.asarray(self.slot_minps),
            "typps": jnp.asarray(self.slot_typps),
            "tfs": jnp.asarray(self.slot_tfs),
            "reps": jnp.asarray(self.slot_reps),
            "pres": jnp.asarray(self.slot_pres),
            "freqs": jnp.asarray(self.slot_freqs),
            "lastn": jnp.asarray(self.slot_lastn),
            "bias_ids": jnp.asarray(self.slot_bias_ids),
            "bias_vals": jnp.asarray(self.slot_bias_vals),
            "miro": jnp.asarray(self.slot_miro),
            "mtau": jnp.asarray(self.slot_mtau),
            "meta": jnp.asarray(self.slot_meta),
        }
        d_seeds = jnp.asarray(self.slot_seeds)
        d_ctr = jnp.asarray(self.slot_counters)
        d_ring = jnp.asarray(ring)
        d_mu = jnp.asarray(self.slot_mu)
        # segregated constrained decoding (VERDICT r2 item 5): while a
        # grammar/json request is active, the burst view masks the
        # constrained rows (they'd run ahead of host re-selection) and a
        # second "cand" view masks everything EXCEPT them, so the
        # unconstrained slots keep their K-step burst while constrained
        # rows single-step through the full-logits program. Views share
        # every device array the programs don't donate (only pools are).
        cons_rows = [
            i for i, r in enumerate(self.slots)
            if r is not None and not r.pending and r.sampling.constrained
        ]
        if cons_rows:
            pt_c = np.zeros_like(pt)
            sl_c = np.zeros_like(sl)
            last_c = np.zeros_like(last)
            sids_c = np.full_like(sids, NS)
            for i in cons_rows:
                pt_c[i] = pt[i]
                sl_c[i] = sl[i]
                last_c[i] = last[i]
                sids_c[i] = sids[i]
                pt[i] = 0
                sl[i] = 0
                last[i] = 0
                sids[i] = NS
            self._dstate_cand = (
                jnp.asarray(last_c), jnp.asarray(pt_c), jnp.asarray(sl_c),
                d_seeds, d_ctr, jnp.asarray(sids_c), d_ring, samp, d_mu,
            )
        else:
            self._dstate_cand = None
        self._dstate = (
            jnp.asarray(last),
            jnp.asarray(pt),
            jnp.asarray(sl),
            d_seeds,
            d_ctr,
            jnp.asarray(sids),
            d_ring,
            samp,
            d_mu,
        )
        if self.ecfg.speculative_k > 0:
            # device-resident token history for n-gram drafting:
            # hist[b, pos] = token at sequence position pos
            hist = np.zeros((NS, self.ecfg.max_context), np.int32)
            for i, r in enumerate(self.slots):
                if r is not None and not r.pending:
                    toks_all = (r.prompt_ids + r.output_ids)[: self.ecfg.max_context]
                    hist[i, : len(toks_all)] = toks_all
            self._dhist = jnp.asarray(hist)
        self._mp_bucket = mp
        self._dirty = False

    def reset_prefix_cache(self) -> int:
        """Drop every radix-cached page, returning them to the free
        pool. Returns the number of pages released.

        Ops/bench hygiene (llama.cpp's `/slots` erase analog): radix
        pages persist after requests finish, so a warmed engine whose
        pool is near capacity evicts — or, under decode pressure,
        preemption-retracts a live request — mid-run. On the 8x3968
        serving bench that retraction re-served 1,904 prompt tokens
        from the victim's own published pages inside the measured
        window (radix_hit_tokens on fully-disjoint prompts) and swung
        trial walls 36%. Refuses while any request is active."""
        with self._lock:
            if (
                any(r is not None for r in self.slots)
                or self._backlog
                or not self.waiting.empty()
            ):
                raise RuntimeError(
                    "reset_prefix_cache requires an idle engine")
            if self.radix is None:
                return 0
            n = self.radix.num_cached_pages
            self.radix.reset()
            return n

    def warmup(self, *, prefill_batches=(1,), page_buckets=None,
               full: bool = False) -> Dict[str, float]:
        """AOT-precompile the serving programs (engine/programs.py)."""
        from .programs import warmup

        return warmup(self, prefill_batches=prefill_batches,
                      page_buckets=page_buckets, full=full)

    def _pages_bucket(self, tokens_needed: int) -> int:
        """Page-table width covering `tokens_needed`, rounded to the next
        power of two (few jit variants) — attention gathers history for
        every table column, so a 4K-context table would read 256 pages
        per slot even for 50-token sequences."""
        need = -(-tokens_needed // self.page_size) + 1
        mp = 8  # >= 8 keeps hist a 128-multiple (flash-prefill tiling)
        while mp < need:
            mp *= 2
        return min(mp, self.max_pages_per_seq)

    def _finish_notify(self, req: Request, reason: str):
        """Finish without a token emission (grammar dead-end/complete):
        stream consumers still need a final (fin=True) notification."""
        req.finish_reason = reason
        req.finished = True
        if req.on_token is not None:
            req.on_token(-1, True)
        self._finish(req, reason)

    def _make_validator(self, s: SamplingParams):
        from .constrained import make_validator

        return make_validator(self, s)

    def _select_constrained(self, req: Request, logits_row: np.ndarray):
        from .constrained import select_constrained

        return select_constrained(self, req, logits_row)

    def _decode(self) -> bool:
        # mid-prefill slots don't decode (masked to trash in _upload_state)
        active = [
            i for i, r in enumerate(self.slots)
            if r is not None and not r.pending
        ]
        if not active:
            return False
        K = self.ecfg.decode_burst
        ps = self.page_size
        spec_k = self.ecfg.speculative_k
        # adaptive cutoff (EngineConfig.spec_min_accept): sticky-off
        # once the realized acceptance shows drafting is a net loss
        if (
            spec_k > 0
            and self.ecfg.spec_min_accept > 0.0
            and not getattr(self, "_spec_off", False)
            and self.stats.get("spec_drafted", 0)
            >= self.ecfg.spec_min_accept_window
        ):
            rate = self.stats.get("spec_accepted", 0) / (
                self.stats["spec_drafted"] * spec_k
            )
            if rate < self.ecfg.spec_min_accept:
                self._spec_off = True
                logger.info(
                    "speculative decoding auto-disabled: accept rate "
                    "%.3f < spec_min_accept %.3f over %d drafts",
                    rate, self.ecfg.spec_min_accept,
                    self.stats["spec_drafted"],
                )
        want_lp = any(self.slots[i].sampling.logprobs_k > 0 for i in active)
        spec = (
            spec_k > 0
            and not getattr(self, "_spec_off", False)
            and not want_lp
            and all(
                self.slots[i].sampling.temperature == 0.0
                and not self.slots[i].sampling.has_penalties
                and not self.slots[i].sampling.has_logit_bias
                and not self.slots[i].sampling.constrained
                for i in active
            )
        )
        adv = K * (spec_k + 1) if spec else K  # max positions per burst

        # make sure pages cover the burst's maximum advance per slot;
        # a dry pool preempts (retracts) a victim instead of killing
        # anything — no "oom" finish reason is reachable from decode
        for i in active:
            req = self.slots[i]
            if req is None:  # retracted as a victim earlier in this loop
                continue
            lp_lo = req.seq_len // ps
            lp_hi = min((req.seq_len + adv - 1) // ps, self.max_pages_per_seq - 1)
            for lp in range(lp_lo, lp_hi + 1):
                if self.page_table[i, lp] == 0:
                    pg = self._alloc_or_preempt(req)
                    if pg is None:  # req itself was the retracted victim
                        break
                    req.pages.append(pg)
                    self.page_table[i, lp] = pg
                    self._dirty = True

        active = [
            i for i, r in enumerate(self.slots)
            if r is not None and not r.pending
        ]
        if not active:
            return True

        max_seq = max(self.seq_lens[i] for i in active)
        mp = self._pages_bucket(int(max_seq) + adv)
        if self._dirty or self._dstate is None or mp != self._mp_bucket:
            self._upload_state(mp)
        (d_last, d_pt, d_sl, d_seeds, d_ctr, d_sids, d_ring,
         d_samp, d_mu) = self._dstate
        room_cap = min(self.ecfg.max_context, self.max_pages_per_seq * ps)

        if spec:
            if self._decode_spec_jit is None:
                self._decode_spec_jit = self._build_decode_spec()
            toks_d, counts_d, self.pools, d_last, d_sl, self._dhist = (
                self._decode_spec_jit(
                    self.params, self.pools, d_last, d_pt, d_sl, d_seeds,
                    d_ctr, d_sids, self._dhist,
                )
            )
            self._dstate = (d_last, d_pt, d_sl, d_seeds, d_ctr, d_sids,
                            d_ring, d_samp, d_mu)
            toks = np.asarray(toks_d)  # [K, S, k+1]
            counts = np.asarray(counts_d)  # [K, S]
            self.stats["decode_steps"] += K
            for i in active:
                req = self.slots[i]
                for step in range(K):
                    if req.finished:
                        break
                    n = int(counts[step, i])
                    self.stats["spec_drafted"] = self.stats.get("spec_drafted", 0) + 1
                    self.stats["spec_accepted"] = (
                        self.stats.get("spec_accepted", 0) + n - 1
                    )
                    for j in range(n):
                        if req.finished:
                            break
                        if req.seq_len >= room_cap:
                            self._finish(req, "length")
                            break
                        req.seq_len += 1
                        self.seq_lens[i] = req.seq_len
                        tok = int(toks[step, i, j])
                        self.stats["decode_tokens"] += 1
                        self.slot_counters[i] += 1
                        self._emit_token(req, tok)
                        if not req.finished:
                            self.last_tokens[i] = tok
            return True

        cons = [i for i in active if self.slots[i].sampling.constrained]
        if cons:
            # segregated constrained decoding (VERDICT r2 item 5): the
            # unconstrained slots keep their K-step burst on the burst
            # view (constrained rows masked to trash there), while the
            # constrained rows single-step through the full-logits cand
            # program on the cand view (everything else masked). Both
            # programs dispatch back-to-back — pools chain through
            # donation — before either result is fetched, so the whole
            # step costs ~one transport round trip; and only the
            # constrained rows' logits are fetched (V floats per row,
            # not the full [S, V] block).
            uncons = [i for i in active
                      if not self.slots[i].sampling.constrained]
            if self._dstate_cand is None:
                self._upload_state(mp)
            if self._decode_cand_jit is None:
                self._decode_cand_jit = self._build_decode(return_logits=True)
            burst_fetch = self._dispatch_burst(uncons) if uncons else None
            (c_last, c_pt, c_sl, c_seeds, c_ctr, c_sids, c_ring,
             c_samp, c_mu) = self._dstate_cand
            outs_d, self.pools, _, _, _, _ = self._decode_cand_jit(
                self.params, self.pools, c_last, c_pt, c_sl, c_seeds,
                c_ctr, c_sids, c_ring, c_samp,
            )
            _, logits_d = outs_d
            if burst_fetch is not None:
                burst_fetch()
            self.stats["decode_steps"] += 1
            for i in cons:
                req = self.slots[i]
                if req.finished:
                    continue
                if req.seq_len >= room_cap:
                    self._finish(req, "length")
                    continue
                req.seq_len += 1
                self.seq_lens[i] = req.seq_len
                row = np.asarray(logits_d[0, i])  # this row only
                tok, status = self._select_constrained(req, row)
                if tok is None:  # dead end: no legal continuation
                    self._finish_notify(req, "stop")
                    continue
                self.stats["decode_tokens"] += 1
                self.slot_counters[i] += 1
                self._emit_token(req, tok)
                if not req.finished and status == "complete":
                    self._finish_notify(req, "stop")
                if not req.finished:
                    self.last_tokens[i] = tok
            # host-corrected tokens must reach the device: force a state
            # re-upload before the next dispatch
            self._dirty = True
            return True

        self._dispatch_burst(active)()
        return True

    def _dispatch_burst(self, rows):
        """Dispatch one K-step decode burst for `rows` on the current
        ``self._dstate`` view and return a closure that fetches the
        sampled tokens and emits them. Dispatch and fetch are split so
        the segregated constrained path can enqueue its single-step
        program behind the burst before paying the transport round
        trip (both dispatches then cost ~one trip together)."""
        (d_last, d_pt, d_sl, d_seeds, d_ctr, d_sids, d_ring, d_samp,
         d_mu) = self._dstate
        K = self.ecfg.decode_burst
        room_cap = min(
            self.ecfg.max_context, self.max_pages_per_seq * self.page_size
        )
        want_lp = any(self.slots[i].sampling.logprobs_k > 0 for i in rows)
        want_miro = any(self.slots[i].sampling.mirostat for i in rows)
        # adaptive burst length: when every row finishes within this
        # burst anyway (max remaining budget < K), a shorter compiled
        # variant avoids whole-batch idle tail steps — the decode step
        # cost is weight-stream-bound and batch-invariant, so steps past
        # the LAST active row's finish are pure waste (up to half the
        # burst on 32-new-token scenarios at K=64). Buckets are K/2^i
        # (floor 8), built lazily, cached by the persistent compile
        # cache. Plain variant only (logprobs/mirostat bursts are rare).
        if not want_lp and not want_miro and K > 8:
            rem = 1
            for i in rows:
                r = self.slots[i]
                rem = max(rem, min(
                    r.sampling.max_new_tokens - len(r.output_ids),
                    room_cap - r.seq_len,
                ))
            k_eff = K
            while k_eff // 2 >= max(8, rem):
                k_eff //= 2
            K = k_eff
        if want_miro:
            if self._decode_miro_jit is None:
                self._decode_miro_jit = self._build_decode(with_mirostat=True)
            outs_d, self.pools, d_last, d_sl, d_ctr, d_ring, d_mu = (
                self._decode_miro_jit(
                    self.params, self.pools, d_last, d_pt, d_sl, d_seeds,
                    d_ctr, d_sids, d_ring, d_samp, d_mu,
                )
            )
        else:
            if want_lp:
                if self._decode_lp_jit is None:
                    self._decode_lp_jit = self._build_decode(with_logprobs=True)
                fn = self._decode_lp_jit
            elif K != self.ecfg.decode_burst:
                if K not in self._decode_jits_k:
                    from .programs import build_decode

                    self._decode_jits_k[K] = build_decode(
                        self, burst_steps=K
                    )
                fn = self._decode_jits_k[K]
            else:
                fn = self._decode_jit
            outs_d, self.pools, d_last, d_sl, d_ctr, d_ring = fn(
                self.params, self.pools, d_last, d_pt, d_sl, d_seeds, d_ctr,
                d_sids, d_ring, d_samp,
            )
        self._dstate = (d_last, d_pt, d_sl, d_seeds, d_ctr, d_sids,
                        d_ring, d_samp, d_mu)

        def fetch():
            if want_lp:
                toks_d, chosen_d, tids_d, tlps_d = outs_d
                lp_data = (np.asarray(chosen_d), np.asarray(tids_d),
                           np.asarray(tlps_d))  # [K,S], [K,S,N], [K,S,N]
            else:
                toks_d, lp_data = outs_d, None
            toks = np.asarray(toks_d)  # [K, S] — the burst's single D2H fetch
            self.stats["decode_steps"] += toks.shape[0]

            for i in rows:
                req = self.slots[i]
                for k in range(toks.shape[0]):
                    if req.finished:
                        break
                    if req.seq_len >= room_cap:
                        self._finish(req, "length")
                        break
                    req.seq_len += 1
                    self.seq_lens[i] = req.seq_len
                    tok = int(toks[k, i])
                    self.stats["decode_tokens"] += 1
                    self.slot_counters[i] += 1
                    lp = None
                    if lp_data is not None and req.sampling.logprobs_k > 0:
                        lp = (lp_data[0][k, i], lp_data[1][k, i],
                              lp_data[2][k, i])
                    self._emit_token(req, tok, lp)
                    if not req.finished:
                        self.last_tokens[i] = tok

        return fetch

    # ------------------------------------------------------------------
    # finishing
    # ------------------------------------------------------------------

    def _emit_token(self, req: Request, tok: int, lp=None):
        if req.first_token_t is None:
            req.first_token_t = time.monotonic()
        req.output_ids.append(tok)
        if lp is not None:
            chosen, tids, tlps = lp
            k = min(req.sampling.logprobs_k, len(tids))
            req.logprobs_seq.append(
                (float(chosen),
                 [(int(tids[j]), float(tlps[j])) for j in range(k)])
            )
        s = req.sampling
        finished = False
        reason = ""
        if not s.ignore_eos and self.eos_token_id is not None and tok == self.eos_token_id:
            finished, reason = True, "stop"
        elif s.stop_token_ids and tok in s.stop_token_ids:
            finished, reason = True, "stop"
        elif len(req.output_ids) >= s.max_new_tokens:
            finished, reason = True, "length"
        elif req.seq_len + 1 >= self.ecfg.max_context:
            finished, reason = True, "length"
        if finished:
            # set the reason BEFORE notifying: stream consumers read
            # req.finish_reason as soon as they see fin=True
            req.finish_reason = reason
        if req.on_token is not None:
            req.on_token(tok, finished)
        if finished:
            self._finish(req, reason)

    def _pick_victim(self, prefer_not: Request | None = None):
        """Retraction victim under page pressure: the occupied slot with
        the most remaining token budget (its re-prefill cost is smallest
        relative to the work it still has to do); ties broken toward the
        youngest arrival. Falls back to `prefer_not` itself when it is
        the only occupied slot."""
        cands = [r for r in self.slots if r is not None]
        if not cands:
            return None
        others = [r for r in cands if r is not prefer_not]
        pool = others or cands
        return max(
            pool,
            key=lambda r: (
                r.sampling.max_new_tokens - len(r.output_ids),
                r.arrival_t,
            ),
        )

    def _alloc_or_preempt(self, req: Request):
        """Allocate one KV page; on a dry pool, retract victims until
        the allocation succeeds. Returns None iff `req` itself was the
        victim (nothing else held pages)."""
        while True:
            try:
                (pg,) = self._alloc_pages(1)
                return pg
            except MemoryError:
                victim = self._pick_victim(prefer_not=req)
                if victim is None:
                    return None
                self._preempt(victim)
                if victim is req:
                    return None

    def _preempt(self, req: Request):
        """SGLang-style retraction (SURVEY.md §2.3 continuous-batching
        row; recovery semantics of reference tests/test_stress.py:276-330):
        instead of failing a request when the page pool runs dry, free
        its slot and pages — full pages feed the radix tree, they are
        valid KV for the stream so far — and requeue it. Re-admission
        re-prefills prompt+generated (_start_request folds output_ids
        into the prefill source; the radix cache recovers the shared
        prefix) and the seeded sampling stream continues exactly
        (counter = counter_base + len(output_ids)). Emitted tokens are
        never re-emitted and streams resume token-identically
        (tests/test_preemption.py::test_page_oom_preempts_not_kills)."""
        self._dirty = True
        slot = req.slot
        if slot >= 0 and self.slots[slot] is req:
            self.slots[slot] = None
            self.page_table[slot] = 0
            self.seq_lens[slot] = 0
            self.last_tokens[slot] = 0
        req.slot = -1
        seq_tokens = req.prompt_ids + req.output_ids
        full = req.seq_len // self.page_size
        if self.radix is not None:
            if full > 0:
                all_pages = req.matched_pages + req.pages
                self.radix.insert(
                    seq_tokens[: full * self.page_size], all_pages[:full]
                )
            self.radix.unlock(req.matched_nodes)
        self.allocator.release_all(req.pages)
        req.pages = []
        req.matched_nodes = []
        req.matched_pages = []
        req.matched_tokens = 0
        req.seq_len = 0
        req.pending = []
        self.stats["preemptions"] = self.stats.get("preemptions", 0) + 1
        logger.info("retracted request %d under page pressure "
                    "(%d tokens generated so far)", req.rid, len(req.output_ids))
        self._requeue(req)

    def cancel(self, req: Request, reason: str = "abort") -> bool:
        """Terminate an in-flight or queued request (stop-string hit,
        client disconnect). Thread-safe; no-op if already finished. The
        slot/pages free immediately; full pages still feed the radix
        cache. Returns True if the request was actually cancelled."""
        with self._lock:
            if req.finished:
                return False
            while True:  # drain waiting -> backlog so queued reqs are visible
                try:
                    self._backlog.append(self.waiting.get_nowait())
                except queue.Empty:
                    break
            if req in self._backlog:
                self._backlog.remove(req)
            req.finish_reason = reason
            req.finished = True
            if req.on_token is not None:
                req.on_token(-1, True)
            self._finish(req, reason)
            return True

    def latency_summary(self) -> dict:
        """p50/p95/p99 TTFT and end-to-end latency over the rolling
        window of finished requests (empty dict until one finishes)."""
        log = list(self.latency_log)
        if not log:
            return {}
        ttfts = np.asarray([x[0] for x in log])
        e2es = np.asarray([x[1] for x in log])
        q = [50, 95, 99]
        t50, t95, t99 = np.percentile(ttfts, q)
        e50, e95, e99 = np.percentile(e2es, q)
        return {
            "window": len(log),
            "ttft_s": {"p50": round(float(t50), 4), "p95": round(float(t95), 4),
                       "p99": round(float(t99), 4)},
            "e2e_s": {"p50": round(float(e50), 4), "p95": round(float(e95), 4),
                      "p99": round(float(e99), 4)},
        }

    def _finish(self, req: Request, reason: str):
        self._dirty = True
        req.finished = True
        req.finish_reason = reason
        req.finish_t = time.monotonic()
        if req.first_token_t is not None:
            self.latency_log.append((
                req.first_token_t - req.arrival_t,
                req.finish_t - req.arrival_t,
                len(req.output_ids),
            ))
        slot = req.slot
        if slot >= 0 and self.slots[slot] is req:
            self.slots[slot] = None
            self.page_table[slot] = 0
            self.seq_lens[slot] = 0
            self.last_tokens[slot] = 0

        # hand full pages to the radix tree, release the rest
        seq_tokens = req.prompt_ids + req.output_ids
        full = req.seq_len // self.page_size
        if self.radix is not None and full > 0:
            # matched_pages (not node objects): nodes are opaque handles
            # under the native C++ runtime
            all_pages = req.matched_pages + req.pages
            self.radix.insert(seq_tokens[: full * self.page_size], all_pages[:full])
        if self.radix is not None:
            self.radix.unlock(req.matched_nodes)
        self.allocator.release_all(req.pages)
        req.pages = []
        req.matched_nodes = []
        req.matched_pages = []
