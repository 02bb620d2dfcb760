"""Async bridge over the Engine: a dedicated scheduler thread runs the
jitted step loop; asyncio consumers stream tokens via thread-safe queues.

This mirrors the layering of the reference's Rust gateway over the C++
runtime (SURVEY.md §3.2) the TPU way: the hot loop is one dispatched jit
program, so the server language costs nothing per token.
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
from typing import AsyncIterator, List, Optional, Tuple

from ..engine.engine import Engine, Request
from ..engine.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class AsyncEngine:
    """One scheduler thread per engine replica. With a single Engine
    this is the plain async bridge; with a list (data-parallel serving,
    ``--dp N``) each replica runs its own step loop and requests are
    routed least-loaded-first (parallel/router.py policy — SURVEY.md
    §2.3 DP row, absent in the reference)."""

    def __init__(self, engine):
        engines = list(engine) if isinstance(engine, (list, tuple)) else [engine]
        if not engines:
            raise ValueError("need at least one engine")
        self.engines = engines
        self.engine = engines[0]  # primary: config/metadata endpoints
        self._rr = 0
        self._pick_lock = threading.Lock()
        self._stop = threading.Event()
        # per-replica wake events: an idle scheduler thread parks on its
        # event (50 ms cap) instead of spinning a 1 ms sleep loop — on a
        # 1-CPU host N idle engines would otherwise eat the core, and a
        # submit still wakes the loop immediately
        self._wakes = [threading.Event() for _ in engines]
        self._threads = [
            threading.Thread(target=self._loop, args=(e, w), daemon=True,
                             name=f"wf-engine-{i}")
            for i, (e, w) in enumerate(zip(engines, self._wakes))
        ]
        for t in self._threads:
            t.start()

    def _loop(self, engine: Engine, wake: threading.Event):
        while not self._stop.is_set():
            try:
                did = engine.step()
            except Exception:
                logger.exception("engine step failed")
                did = False
            if not did:
                wake.wait(timeout=0.05)
                wake.clear()

    def _wake_for(self, engine: Engine):
        self._wakes[self.engines.index(engine)].set()

    def wake_all(self):
        """Kick every scheduler loop (work submitted out-of-band, e.g.
        /admin/restore)."""
        for w in self._wakes:
            w.set()

    def pick(self) -> Engine:
        """Least-loaded replica (active slots + queue depth), rotating
        among ties for fairness."""
        if len(self.engines) == 1:
            return self.engine
        with self._pick_lock:
            loads = [
                sum(s is not None for s in e.slots) + e.waiting.qsize()
                for e in self.engines
            ]
            m = min(loads)
            ties = [i for i, l in enumerate(loads) if l == m]
            choice = ties[self._rr % len(ties)]
            self._rr += 1
            return self.engines[choice]

    def shutdown(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)

    async def generate_stream(
        self, prompt_ids: List[int], sampling: SamplingParams
    ) -> AsyncIterator[Tuple[int, bool, Request]]:
        """Yield (token_id, finished, request) as the engine produces them."""
        loop = asyncio.get_running_loop()
        eng = self.pick()
        if (
            len(prompt_ids) >= eng.ecfg.max_context
            and getattr(eng, "_long_ctx_mesh", None) is not None
            and sampling.temperature == 0
        ):
            # beyond-max_context request: sequence-parallel ring path
            # (blocking jitted scan — tokens arrive together at the end)
            req = await loop.run_in_executor(
                None, lambda: eng.generate(prompt_ids, sampling)
            )
            for i, tok in enumerate(req.output_ids):
                yield tok, i == len(req.output_ids) - 1, req
            return
        q: asyncio.Queue = asyncio.Queue()

        def on_token(tok: int, fin: bool):
            loop.call_soon_threadsafe(q.put_nowait, (tok, fin))

        req = eng.submit(prompt_ids, sampling, on_token=on_token)
        self._wake_for(eng)
        while True:
            tok, fin = await q.get()
            yield tok, fin, req
            if fin:
                break

    async def generate(
        self, prompt_ids: List[int], sampling: SamplingParams
    ) -> Request:
        req = None
        async for _, fin, r in self.generate_stream(prompt_ids, sampling):
            req = r
        return req
