"""HTTP clients for the inference server (sync + async).

API surface mirrors the reference's BitNetClient/AsyncBitNetClient
(reference client/bitnet_client.py:13-263,266-393): health, tokenize,
detokenize, generate (llama.cpp /completion), chat (OpenAI), with SSE
streaming variants.
"""

from __future__ import annotations

import json
from typing import AsyncIterator, Dict, Iterator, List, Optional

import requests


class InferenceClient:
    def __init__(self, base_url: str = "http://127.0.0.1:30000", timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.session = requests.Session()

    # -- basics ----------------------------------------------------------

    def health(self) -> bool:
        try:
            r = self.session.get(f"{self.base_url}/health", timeout=5)
            return r.status_code == 200
        except requests.RequestException:
            return False

    def models(self) -> List[str]:
        r = self.session.get(f"{self.base_url}/v1/models", timeout=self.timeout)
        r.raise_for_status()
        return [m["id"] for m in r.json()["data"]]

    def tokenize(self, text: str) -> List[int]:
        r = self.session.post(
            f"{self.base_url}/tokenize", json={"content": text}, timeout=self.timeout
        )
        r.raise_for_status()
        return r.json()["tokens"]

    def detokenize(self, tokens: List[int]) -> str:
        r = self.session.post(
            f"{self.base_url}/detokenize", json={"tokens": tokens}, timeout=self.timeout
        )
        r.raise_for_status()
        return r.json()["content"]

    def stats(self) -> Dict:
        r = self.session.get(f"{self.base_url}/stats", timeout=self.timeout)
        r.raise_for_status()
        return r.json()

    def embed(self, text: str) -> List[float]:
        """llama.cpp `/embedding` (single input)."""
        r = self.session.post(
            f"{self.base_url}/embedding", json={"content": text},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["embedding"]

    def embeddings(self, inputs: "str | List[str]", model: str = "") -> List[List[float]]:
        """OpenAI `/v1/embeddings` (batch)."""
        r = self.session.post(
            f"{self.base_url}/v1/embeddings",
            json={"model": model, "input": inputs},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return [d["embedding"] for d in r.json()["data"]]

    # -- generation --------------------------------------------------------

    def generate(
        self, prompt: str, max_tokens: int = 128, temperature: float = 0.7,
        top_p: float = 0.9, **kw,
    ) -> str:
        r = self.session.post(
            f"{self.base_url}/completion",
            json={
                "prompt": prompt, "n_predict": max_tokens,
                "temperature": temperature, "top_p": top_p, **kw,
            },
            timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["content"]

    def generate_stream(
        self, prompt: str, max_tokens: int = 128, temperature: float = 0.7, **kw
    ) -> Iterator[str]:
        r = self.session.post(
            f"{self.base_url}/completion",
            json={"prompt": prompt, "n_predict": max_tokens,
                  "temperature": temperature, "stream": True, **kw},
            stream=True, timeout=self.timeout,
        )
        r.raise_for_status()
        for line in r.iter_lines():
            if not line or not line.startswith(b"data: "):
                continue
            payload = json.loads(line[6:])
            if payload.get("content"):
                yield payload["content"]
            if payload.get("stop"):
                break

    def chat(
        self, messages: List[Dict[str, str]], max_tokens: int = 256,
        temperature: float = 0.7, model: str = "default", **kw,
    ) -> str:
        r = self.session.post(
            f"{self.base_url}/v1/chat/completions",
            json={"model": model, "messages": messages, "max_tokens": max_tokens,
                  "temperature": temperature, **kw},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["choices"][0]["message"]["content"]

    def chat_stream(
        self, messages: List[Dict[str, str]], max_tokens: int = 256,
        temperature: float = 0.7, model: str = "default", **kw,
    ) -> Iterator[str]:
        r = self.session.post(
            f"{self.base_url}/v1/chat/completions",
            json={"model": model, "messages": messages, "max_tokens": max_tokens,
                  "temperature": temperature, "stream": True, **kw},
            stream=True, timeout=self.timeout,
        )
        r.raise_for_status()
        for line in r.iter_lines():
            if not line or not line.startswith(b"data: "):
                continue
            data = line[6:]
            if data == b"[DONE]":
                break
            delta = json.loads(data)["choices"][0]["delta"]
            if delta.get("content"):
                yield delta["content"]


class AsyncInferenceClient:
    """httpx-based async client (reference AsyncBitNetClient analog)."""

    def __init__(self, base_url: str = "http://127.0.0.1:30000", timeout: float = 120.0):
        import httpx

        self.base_url = base_url.rstrip("/")
        self.client = httpx.AsyncClient(timeout=timeout)

    async def aclose(self):
        await self.client.aclose()

    async def health(self) -> bool:
        try:
            r = await self.client.get(f"{self.base_url}/health")
            return r.status_code == 200
        except Exception:
            return False

    async def generate(self, prompt: str, max_tokens: int = 128, **kw) -> str:
        r = await self.client.post(
            f"{self.base_url}/completion",
            json={"prompt": prompt, "n_predict": max_tokens, **kw},
        )
        r.raise_for_status()
        return r.json()["content"]

    async def chat(self, messages, max_tokens: int = 256, **kw) -> str:
        r = await self.client.post(
            f"{self.base_url}/v1/chat/completions",
            json={"model": "default", "messages": messages,
                  "max_tokens": max_tokens, **kw},
        )
        r.raise_for_status()
        return r.json()["choices"][0]["message"]["content"]

    async def chat_stream(self, messages, max_tokens: int = 256, **kw) -> AsyncIterator[str]:
        async with self.client.stream(
            "POST",
            f"{self.base_url}/v1/chat/completions",
            json={"model": "default", "messages": messages,
                  "max_tokens": max_tokens, "stream": True, **kw},
        ) as r:
            r.raise_for_status()
            async for line in r.aiter_lines():
                if not line.startswith("data: "):
                    continue
                data = line[6:]
                if data == "[DONE]":
                    break
                delta = json.loads(data)["choices"][0]["delta"]
                if delta.get("content"):
                    yield delta["content"]
