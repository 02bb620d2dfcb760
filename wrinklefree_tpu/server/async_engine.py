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
    def __init__(self, engine: Engine):
        self.engine = engine
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name="wf-engine")
        self._thread.start()

    def _loop(self):
        while not self._stop.is_set():
            try:
                did = self.engine.step()
            except Exception:
                logger.exception("engine step failed")
                did = False
            if not did:
                time.sleep(0.001)

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)

    async def generate_stream(
        self, prompt_ids: List[int], sampling: SamplingParams
    ) -> AsyncIterator[Tuple[int, bool, Request]]:
        """Yield (token_id, finished, request) as the engine produces them."""
        loop = asyncio.get_running_loop()
        eng = self.engine
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

        req = self.engine.submit(prompt_ids, sampling, on_token=on_token)
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
