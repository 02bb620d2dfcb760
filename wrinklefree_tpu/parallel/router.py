"""Data-parallel serving: request router over engine replicas.

SURVEY.md §2.3 DP row: the reference has no DP — concurrency is only
continuous batching inside one engine. On TPU pods the natural DP unit is
one engine per model replica (each replica itself TP-sharded over its
slice); this router spreads requests across replicas least-loaded-first
and exposes the same submit/generate surface as a single Engine.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence

from ..engine.engine import Engine, Request
from ..engine.sampling_params import SamplingParams


class ReplicaRouter:
    """Least-loaded (then round-robin) router over Engine replicas."""

    def __init__(self, engines: Sequence[Engine]):
        if not engines:
            raise ValueError("need at least one engine replica")
        self.engines: List[Engine] = list(engines)
        self._rr = 0
        self._lock = threading.Lock()

    def _load(self, e: Engine) -> int:
        return sum(s is not None for s in e.slots) + e.waiting.qsize()

    def pick(self) -> Engine:
        with self._lock:
            loads = [self._load(e) for e in self.engines]
            m = min(loads)
            # among the least loaded, rotate for fairness
            candidates = [i for i, l in enumerate(loads) if l == m]
            choice = candidates[self._rr % len(candidates)]
            self._rr += 1
            return self.engines[choice]

    def submit(
        self,
        prompt_ids,
        sampling: Optional[SamplingParams] = None,
        on_token=None,
    ) -> Request:
        return self.pick().submit(prompt_ids, sampling, on_token)

    def generate(self, prompt_ids, sampling: Optional[SamplingParams] = None) -> Request:
        return self.pick().generate(prompt_ids, sampling)

    def step_all(self) -> bool:
        """Drive every replica one scheduling step; True if any had work."""
        did = False
        for e in self.engines:
            did = e.step() or did
        return did

    def has_work(self) -> bool:
        return any(e.has_work() for e in self.engines)

    @property
    def stats(self) -> dict:
        agg: dict = {}
        for e in self.engines:
            for k, v in e.stats.items():
                agg[k] = agg.get(k, 0) + v
        agg["replicas"] = len(self.engines)
        return agg
