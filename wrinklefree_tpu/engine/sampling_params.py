"""Request sampling parameters (OpenAI/llama.cpp-compatible subset,
reference client/bitnet_client.py request fields + configs/serving)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional


@dataclasses.dataclass
class SamplingParams:
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    max_new_tokens: int = 128
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    seed: Optional[int] = None
