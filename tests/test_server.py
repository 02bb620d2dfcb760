"""HTTP server tests: spin the tiny-model server on a real socket and
exercise every endpoint with the real clients (reference analogs:
tests/test_smoke.py, test_batching.py, kv_cache/validator.py — but
self-hosted, so they run in CI too)."""

import asyncio
import json
import socket
import threading
import time

import pytest
import requests

from wrinklefree_tpu.client import InferenceClient
from wrinklefree_tpu.server.http import build_app, create_server


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server_url():
    from aiohttp import web

    port = _free_port()
    server = create_server(tiny=True, use_pallas=False)
    app = build_app(server)
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            if requests.get(f"{url}/health", timeout=1).status_code == 200:
                break
        except requests.RequestException:
            time.sleep(0.1)
    else:
        pytest.fail("server did not come up")
    yield url
    loop.call_soon_threadsafe(loop.stop)
    server.async_engine.shutdown()  # stop scheduler threads (leak = CPU drag)


@pytest.fixture()
def client(server_url):
    return InferenceClient(server_url)


@pytest.mark.smoke
class TestSmoke:
    def test_health(self, client):
        assert client.health()

    def test_models(self, client):
        assert client.models() == ["wrinklefree-tiny-test"]

    def test_tokenize_detokenize(self, client):
        ids = client.tokenize("hello world")
        assert isinstance(ids, list) and all(isinstance(i, int) for i in ids)
        text = client.detokenize(ids)
        assert isinstance(text, str)

    def test_generate(self, client):
        out = client.generate("hello", max_tokens=8, temperature=0.0)
        assert isinstance(out, str)

    def test_chat(self, client):
        out = client.chat([{"role": "user", "content": "hi"}], max_tokens=8,
                          temperature=0.0)
        assert isinstance(out, str)

    def test_stats(self, client):
        s = client.stats()
        assert s["requests"] >= 1 and "free_pages" in s


class TestStreaming:
    def test_chat_stream_sse(self, client):
        chunks = list(
            client.chat_stream([{"role": "user", "content": "hello"}],
                               max_tokens=8, temperature=0.0)
        )
        full = client.chat([{"role": "user", "content": "hello"}],
                           max_tokens=8, temperature=0.0)
        assert "".join(chunks) == full

    def test_completion_stream(self, client):
        chunks = list(client.generate_stream("abc", max_tokens=6, temperature=0.0))
        full = client.generate("abc", max_tokens=6, temperature=0.0)
        assert "".join(chunks) == full

    def test_raw_sse_format(self, server_url):
        """The raw SSE wire format must match the OpenAI contract the
        reference UI parses (demo/serve_sglang.py:88-111)."""
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m", "messages": [{"role": "user", "content": "x"}],
                  "max_tokens": 4, "stream": True},
            stream=True, timeout=60,
        )
        lines = [l for l in r.iter_lines() if l]
        assert all(l.startswith(b"data: ") for l in lines)
        assert lines[-1] == b"data: [DONE]"
        first = json.loads(lines[0][6:])
        assert first["object"] == "chat.completion.chunk"
        assert first["choices"][0]["delta"].get("role") == "assistant"


class TestValidation:
    def test_bad_json(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions", data="{not json",
            headers={"Content-Type": "application/json"}, timeout=10,
        )
        assert r.status_code == 400

    def test_missing_messages(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions", json={"model": "m"}, timeout=10
        )
        assert r.status_code == 400

    def test_determinism_at_temp0(self, client):
        """Reference test_sglang_correctness.py: temp=0 must be deterministic."""
        outs = {client.generate("same prompt", max_tokens=8, temperature=0.0)
                for _ in range(3)}
        assert len(outs) == 1

    def test_concurrent_requests(self, server_url):
        """Batched concurrency smoke (reference tests/test_batching.py:46-302)."""
        import concurrent.futures as cf

        def one(i):
            c = InferenceClient(server_url)
            return c.generate(f"prompt {i}", max_tokens=6, temperature=0.0)

        with cf.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(one, range(8)))
        assert len(results) == 8
        # determinism: same prompt again gives same result
        c = InferenceClient(server_url)
        assert c.generate("prompt 3", max_tokens=6, temperature=0.0) == results[3]


class TestStopStrings:
    """OpenAI `stop` / llama.cpp `stop` (reference gets these from the
    SGLang and llama.cpp servers [submodule]): generation truncates at
    the earliest stop-string occurrence, the stop string itself is never
    emitted, and streaming never leaks a partial prefix of it."""

    def _full_text(self, server_url, max_tokens=16):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": max_tokens, "temperature": 0.0},
            timeout=120,
        ).json()
        return r["choices"][0]["message"]["content"]

    def test_chat_nonstream_stop_truncates(self, server_url):
        full = self._full_text(server_url)
        assert len(full) >= 6
        stop = full[3:5]
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": 16, "temperature": 0.0, "stop": stop},
            timeout=120,
        ).json()
        text = r["choices"][0]["message"]["content"]
        assert text == full[: full.index(stop)]
        assert stop not in text
        assert r["choices"][0]["finish_reason"] == "stop"

    def test_chat_stream_stop_never_leaks(self, server_url):
        full = self._full_text(server_url)
        stop = full[3:5]
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": 16, "temperature": 0.0, "stop": stop,
                  "stream": True},
            stream=True, timeout=120,
        )
        parts, finish = [], None
        for line in r.iter_lines():
            if not line or line == b"data: [DONE]":
                continue
            c = json.loads(line[6:])["choices"][0]
            if c["delta"].get("content"):
                parts.append(c["delta"]["content"])
            if c.get("finish_reason"):
                finish = c["finish_reason"]
        text = "".join(parts)
        assert text == full[: full.index(stop)]
        assert finish == "stop"

    def test_stop_list_earliest_wins(self, server_url):
        full = self._full_text(server_url)
        s1, s2 = full[6:8], full[2:4]  # s2 occurs first in the text
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": 16, "temperature": 0.0, "stop": [s1, s2]},
            timeout=120,
        ).json()
        text = r["choices"][0]["message"]["content"]
        cut = min(full.index(s1), full.index(s2))
        assert text == full[:cut]

    def test_llamacpp_stopped_word(self, server_url):
        full = requests.post(
            f"{server_url}/completion",
            json={"prompt": "hello", "n_predict": 16, "temperature": 0.0},
            timeout=120,
        ).json()["content"]
        stop = full[3:5]
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "hello", "n_predict": 16, "temperature": 0.0,
                  "stop": [stop]},
            timeout=120,
        ).json()
        assert r["content"] == full[: full.index(stop)]
        assert r["stopped_word"] is True
        assert r["stopping_word"] == stop
        assert r["stopped_eos"] is False

    def test_no_stop_unaffected(self, server_url):
        """A stop string that never appears must not change output."""
        full = self._full_text(server_url)
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": 16, "temperature": 0.0, "stop": "ZZZZQQ"},
            timeout=120,
        ).json()
        assert r["choices"][0]["message"]["content"] == full


class TestCancel:
    def test_engine_cancel_frees_slot(self, server_url):
        """Cancelled requests must free their slot and pages (exercised
        indirectly: the server keeps serving after many stop-string
        cancellations)."""
        for i in range(6):
            requests.post(
                f"{server_url}/v1/chat/completions",
                json={"model": "m",
                      "messages": [{"role": "user", "content": f"q{i}"}],
                      "max_tokens": 16, "temperature": 0.0, "stop": "a"},
                timeout=120,
            )
        stats = requests.get(f"{server_url}/stats", timeout=10).json()
        assert stats["active_slots"] == 0
        assert stats["queued"] == 0


class TestLogprobs:
    """Logprobs over the three API dialects (OpenAI chat `logprobs`/
    `top_logprobs`, legacy completions `logprobs: int`, llama.cpp
    `n_probs`). Engine-side math is covered in test_logprobs.py; these
    assert the wire formats."""

    def test_chat_logprobs(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 4, "temperature": 0.0,
                  "logprobs": True, "top_logprobs": 2},
            timeout=120,
        ).json()
        choice = r["choices"][0]
        content = choice["logprobs"]["content"]
        assert len(content) == r["usage"]["completion_tokens"]
        for e in content:
            assert set(e) == {"token", "logprob", "bytes", "top_logprobs"}
            assert e["logprob"] <= 0.0
            assert len(e["top_logprobs"]) == 2
            # greedy: chosen token is the top-1 alternative
            assert e["top_logprobs"][0]["token"] == e["token"]

    def test_chat_without_logprobs_has_no_field(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 2, "temperature": 0.0},
            timeout=120,
        ).json()
        assert "logprobs" not in r["choices"][0]

    def test_completions_legacy_logprobs(self, server_url):
        r = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hello", "max_tokens": 4,
                  "temperature": 0.0, "logprobs": 2},
            timeout=120,
        ).json()
        lp = r["choices"][0]["logprobs"]
        n = r["usage"]["completion_tokens"]
        assert len(lp["tokens"]) == len(lp["token_logprobs"]) == n
        assert len(lp["top_logprobs"]) == len(lp["text_offset"]) == n
        assert all(len(d) <= 2 for d in lp["top_logprobs"])
        # text offsets are cumulative over the token strings
        assert lp["text_offset"] == sorted(lp["text_offset"])

    def test_llamacpp_n_probs(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "hello", "n_predict": 4, "temperature": 0.0,
                  "n_probs": 3},
            timeout=120,
        ).json()
        probs = r["completion_probabilities"]
        assert len(probs) == r["tokens_predicted"]
        for e in probs:
            assert len(e["probs"]) == 3
            for p in e["probs"]:
                assert 0.0 <= p["prob"] <= 1.0

    def test_chat_stream_logprobs(self, server_url):
        import json as _json

        with requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 4, "temperature": 0.0, "stream": True,
                  "logprobs": True, "top_logprobs": 1},
            stream=True, timeout=120,
        ) as resp:
            entries = []
            for line in resp.iter_lines():
                if not line or not line.startswith(b"data: "):
                    continue
                data = line[6:]
                if data == b"[DONE]":
                    break
                choice = _json.loads(data)["choices"][0]
                lp = choice.get("logprobs")
                if lp:
                    entries.extend(lp["content"])
        assert len(entries) == 4
        for e in entries:
            assert e["logprob"] <= 0.0
            assert len(e["top_logprobs"]) == 1


class TestSamplerParams:
    """seed / top_k / min_p over the wire (llama.cpp + OpenAI names)."""

    def test_seed_determinism_at_temp1(self, server_url):
        def run(seed):
            return requests.post(
                f"{server_url}/v1/chat/completions",
                json={"model": "m",
                      "messages": [{"role": "user", "content": "hello"}],
                      "max_tokens": 12, "temperature": 1.0, "seed": seed},
                timeout=120,
            ).json()["choices"][0]["message"]["content"]

        a, b, c = run(42), run(42), run(43)
        assert a == b
        assert a != c  # 12 tokens over a 250-symbol vocab: collision ~0

    def test_top_k_one_equals_greedy(self, server_url):
        def run(extra):
            return requests.post(
                f"{server_url}/completion",
                json={"prompt": "hello", "n_predict": 10, **extra},
                timeout=120,
            ).json()["content"]

        greedy = run({"temperature": 0.0})
        assert run({"temperature": 1.0, "top_k": 1}) == greedy
        assert run({"temperature": 1.0, "min_p": 1.0}) == greedy

    def test_min_p_parsed_and_served(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "hi", "n_predict": 4, "temperature": 0.9,
                  "min_p": 0.05, "seed": 7},
            timeout=120,
        ).json()
        assert r["tokens_predicted"] == 4


class TestOpsEndpoints:
    """llama.cpp ops surface: /props, /slots, Prometheus /metrics."""

    def test_props(self, server_url):
        r = requests.get(f"{server_url}/props", timeout=30).json()
        assert r["total_slots"] == 4
        assert r["default_generation_settings"]["n_ctx"] > 0

    def test_slots_reflect_occupancy(self, server_url):
        r = requests.get(f"{server_url}/slots", timeout=30).json()
        assert len(r) == 4
        assert all(s["state"] in ("idle", "prefill", "decoding") for s in r)

    def test_latency_percentiles(self, server_url):
        """/stats latency window + Prometheus TTFT/e2e summaries appear
        after a request finishes (reference BenchmarkMetrics schema,
        legacy/benchmark/metrics.py — live instead of offline)."""
        requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "warm", "max_tokens": 2,
                  "temperature": 0.0},
            timeout=120,
        )
        lat = requests.get(f"{server_url}/stats", timeout=30).json()["latency"]
        assert lat["window"] >= 1
        assert 0 < lat["ttft_s"]["p50"] <= lat["ttft_s"]["p99"]
        assert lat["ttft_s"]["p50"] <= lat["e2e_s"]["p50"]
        text = requests.get(f"{server_url}/metrics", timeout=30).text
        assert 'wf_ttft_seconds{quantile="0.50"}' in text
        assert 'wf_e2e_latency_seconds{quantile="0.99"}' in text

    def test_client_embeddings(self, server_url):
        from wrinklefree_tpu.client import InferenceClient

        c = InferenceClient(server_url)
        e1 = c.embed("hello")
        (e2,) = c.embeddings("hello")
        assert e1 == e2 and len(e1) > 0

    def test_metrics_prometheus(self, server_url):
        # generate something first so counters are non-zero
        requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hi", "max_tokens": 2,
                  "temperature": 0.0},
            timeout=120,
        )
        resp = requests.get(f"{server_url}/metrics", timeout=30)
        assert resp.headers["Content-Type"].startswith("text/plain")
        metrics = {}
        for line in resp.text.splitlines():
            if line and not line.startswith("#"):
                k, v = line.rsplit(" ", 1)
                metrics[k] = float(v)
        assert metrics["wf_requests_total"] >= 1
        assert metrics["wf_decode_tokens_total"] >= 1
        assert metrics["wf_slots_total"] == 4
        assert metrics["wf_uptime_seconds"] > 0


class TestEmbeddings:
    """OpenAI /v1/embeddings + llama.cpp /embedding (llama-server
    surface): masked mean-pool of final hidden states, L2-normalized."""

    def test_openai_single(self, server_url):
        r = requests.post(
            f"{server_url}/v1/embeddings",
            json={"model": "m", "input": "hello world"},
            timeout=120,
        ).json()
        assert r["object"] == "list" and len(r["data"]) == 1
        emb = r["data"][0]["embedding"]
        assert len(emb) > 0
        import math

        norm = math.sqrt(sum(x * x for x in emb))
        assert abs(norm - 1.0) < 1e-3  # L2-normalized
        assert r["usage"]["prompt_tokens"] == 11

    def test_openai_batch_and_determinism(self, server_url):
        def get(texts):
            return requests.post(
                f"{server_url}/v1/embeddings",
                json={"model": "m", "input": texts},
                timeout=120,
            ).json()["data"]

        a = get(["alpha", "beta"])
        b = get(["alpha"])
        assert [d["index"] for d in a] == [0, 1]
        assert a[0]["embedding"] == b[0]["embedding"]  # deterministic
        assert a[0]["embedding"] != a[1]["embedding"]

    def test_padding_invariance(self, server_url):
        """Bucket padding must not change the embedding: a 17-char input
        (bucket 32) equals itself; different-length inputs sharing a
        prefix differ — and the same text via both endpoints matches."""
        text = "abcdefghijklmnopq"  # 17 bytes -> bucket 32
        oa = requests.post(
            f"{server_url}/v1/embeddings",
            json={"model": "m", "input": text}, timeout=120,
        ).json()["data"][0]["embedding"]
        lc = requests.post(
            f"{server_url}/embedding",
            json={"content": text}, timeout=120,
        ).json()["embedding"]
        assert oa == lc


class TestOpenAIExtras:
    """OpenAI `n` (multiple choices), `echo`, `stream_options.include_usage`."""

    def test_n_choices(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 6, "temperature": 1.0, "n": 3},
            timeout=120,
        ).json()
        assert [c["index"] for c in r["choices"]] == [0, 1, 2]
        texts = [c["message"]["content"] for c in r["choices"]]
        assert len(set(texts)) > 1  # independent samples
        # EOS may end a choice early at temp 1: bounded, not exact
        assert 3 <= r["usage"]["completion_tokens"] <= 18

    def test_n_with_seed_is_deterministic(self, server_url):
        def run():
            r = requests.post(
                f"{server_url}/v1/completions",
                json={"model": "m", "prompt": "hello", "max_tokens": 5,
                      "temperature": 1.0, "n": 2, "seed": 9},
                timeout=120,
            ).json()
            return [c["text"] for c in r["choices"]]

        a, b = run(), run()
        assert a == b
        assert a[0] != a[1]  # choice i samples on seed+i

    def test_echo(self, server_url):
        r = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hello", "max_tokens": 3,
                  "temperature": 0.0, "echo": True},
            timeout=120,
        ).json()
        no_echo = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hello", "max_tokens": 3,
                  "temperature": 0.0},
            timeout=120,
        ).json()
        assert r["choices"][0]["text"].endswith(no_echo["choices"][0]["text"])
        assert len(r["choices"][0]["text"]) > len(no_echo["choices"][0]["text"])

    def test_stream_include_usage(self, server_url):
        import json as _json

        with requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 5, "temperature": 0.0, "stream": True,
                  "stream_options": {"include_usage": True}},
            stream=True, timeout=120,
        ) as resp:
            usage = None
            for line in resp.iter_lines():
                if not line or not line.startswith(b"data: ") or line == b"data: [DONE]":
                    continue
                d = _json.loads(line[6:])
                if d.get("usage"):
                    assert d["choices"] == []
                    usage = d["usage"]
        assert usage is not None and usage["completion_tokens"] == 5

    def test_logit_bias_openai_dict(self, server_url):
        # tiny ByteTokenizer decodes id -> chr(id - 1): 88 -> 'W'.
        # +100 dominates the tiny model's ~±1 logits: every step picks it.
        r = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hello", "max_tokens": 4,
                  "temperature": 0.0, "logit_bias": {"88": 100}},
            timeout=120,
        ).json()
        assert r["choices"][0]["text"] == "WWWW"

    def test_logit_bias_ban_beats_positive(self, server_url):
        # 88 at +100 would win, but -100 maps to a hard ban (-1e9), so
        # 91 at +90 ('Z') takes over
        r = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hello", "max_tokens": 3,
                  "temperature": 0.0,
                  "logit_bias": {"88": -100, "91": 90}},
            timeout=120,
        ).json()
        assert r["choices"][0]["text"] == "ZZZ"

    def test_logit_bias_llamacpp_array(self, server_url):
        # llama.cpp form: [[id, bias]]; 89 -> 'X'
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "hi", "n_predict": 3, "temperature": 0.0,
                  "logit_bias": [[89, 100.0]]},
            timeout=120,
        ).json()
        assert r["content"] == "XXX"

    def test_logit_bias_parse_mapping(self, server_url):
        # -100 (OpenAI) and `false` (llama.cpp) both map to a hard ban
        import types

        from wrinklefree_tpu.server.http import InferenceServer

        s = InferenceServer.__new__(InferenceServer)
        s.async_engine = types.SimpleNamespace(
            engine=types.SimpleNamespace(
                ecfg=types.SimpleNamespace(logit_bias_slots=16)
            )
        )
        sp = s._sampling_from({"logit_bias": {"7": -100, "9": 55}})
        assert sp.logit_bias == [(7, -1e9), (9, 55.0)]
        sp = s._sampling_from(
            {"logit_bias": [[7, False], [9, -2.5]]}, is_llamacpp=True
        )
        assert sp.logit_bias == [(7, -1e9), (9, -2.5)]

    def test_stream_n_gt_1_rejected(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 4, "stream": True, "n": 2},
            timeout=120,
        )
        assert r.status_code == 400


class TestJsonMode:
    """OpenAI response_format json_object: output must be a valid JSON
    object (or a valid prefix when cut by max_tokens)."""

    def _check(self, text, reason):
        from wrinklefree_tpu.engine.json_constraint import JsonPrefixValidator

        v = JsonPrefixValidator()
        r = v.advance(text)
        assert r != "dead", text
        if reason == "stop":
            json.loads(text)

    def test_completions_json_object(self, server_url):
        r = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "give me json", "max_tokens": 24,
                  "temperature": 0.0,
                  "response_format": {"type": "json_object"}},
            timeout=300,
        ).json()
        c = r["choices"][0]
        assert c["text"].lstrip().startswith("{")
        self._check(c["text"], c["finish_reason"])

    def test_chat_json_object_sampled(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "json please"}],
                  "max_tokens": 24, "temperature": 0.8, "seed": 5,
                  "response_format": {"type": "json_object"}},
            timeout=300,
        ).json()
        c = r["choices"][0]
        self._check(c["message"]["content"], c["finish_reason"])

    def test_llamacpp_json_schema(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "json", "n_predict": 24, "temperature": 0.0,
                  "json_schema": {}},
            timeout=300,
        ).json()
        self._check(
            r["content"], "stop" if r.get("stopped_eos") else "length"
        )

    def test_grammar_constrains_output(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "x", "n_predict": 8, "temperature": 0.0,
                  "grammar": 'root ::= "yes" | "no"'},
            timeout=300,
        ).json()
        assert r["content"] in ("yes", "no")

    def test_grammar_digits_sampled(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "n", "n_predict": 8, "temperature": 1.0,
                  "seed": 7, "grammar": "root ::= [0-9]{2,4}"},
            timeout=300,
        ).json()
        assert r["content"].isdigit() and 2 <= len(r["content"]) <= 4

    def test_bad_grammar_400(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "x", "n_predict": 4, "grammar": "root := nope"},
            timeout=60,
        )
        assert r.status_code == 400


class TestAdminResetCache:
    def test_reset_cache_idle(self, server_url):
        # seed the radix with one request, then drop it
        requests.post(
            f"{server_url}/completion",
            json={"prompt": "warm the cache with some tokens here",
                  "n_predict": 4, "temperature": 0.0},
            timeout=120,
        )
        r = requests.post(f"{server_url}/admin/reset-cache", timeout=30)
        assert r.status_code == 200
        body = r.json()
        assert isinstance(body["dropped_pages"], list)
        # idempotent: second reset drops nothing
        r2 = requests.post(f"{server_url}/admin/reset-cache", timeout=30)
        assert r2.json()["dropped_pages"] == [0] * len(body["dropped_pages"])


class TestAdminSnapshot:
    """Preemption over HTTP: /admin/snapshot captures in-flight requests
    (token ids + sampling state, no tensors); /admin/restore resubmits
    them — e.g. on a fresh server after a restart."""

    def test_snapshot_empty(self, server_url):
        snap = requests.post(f"{server_url}/admin/snapshot", timeout=30).json()
        assert snap["version"] == 1 and isinstance(snap["requests"], list)

    def test_snapshot_captures_inflight_and_restores(self, server_url):
        import concurrent.futures as cf

        def long_req():
            return requests.post(
                f"{server_url}/v1/completions",
                json={"model": "m", "prompt": "slow", "max_tokens": 200,
                      "temperature": 0.0, "ignore_eos": True},
                timeout=300,
            )

        with cf.ThreadPoolExecutor(1) as ex:
            fut = ex.submit(long_req)
            snap = None
            for _ in range(100):
                snap = requests.post(
                    f"{server_url}/admin/snapshot", timeout=30
                ).json()
                if snap["requests"]:
                    break
                time.sleep(0.05)
            assert snap and len(snap["requests"]) == 1
            d = snap["requests"][0]
            assert d["max_new_tokens"] <= 200
            assert d["prompt_ids"]
            fut.result()

        r = requests.post(
            f"{server_url}/admin/restore",
            json={"version": 1, "requests": [{
                "prompt_ids": [105, 106], "output_ids": [], "counter_base": 0,
                "seed": 1, "max_new_tokens": 3, "temperature": 0.0,
                "top_p": 1.0, "top_k": 0, "min_p": 0.0,
                "stop_token_ids": [], "ignore_eos": True,
                "repetition_penalty": 1.0, "presence_penalty": 0.0,
                "frequency_penalty": 0.0, "penalty_last_n": 64,
                "logprobs_k": 0, "logit_bias": [], "json_mode": False,
            }]},
            timeout=60,
        ).json()
        assert r["restored"] == 1

    def test_restore_bad_version(self, server_url):
        r = requests.post(
            f"{server_url}/admin/restore", json={"version": 99}, timeout=30
        )
        assert r.status_code == 400


class TestReviewRegressions:
    """Fixes from the session code review."""

    def test_stream_with_oversized_logit_bias_400s_cleanly(self, server_url):
        # must 400 BEFORE SSE headers, not break mid-stream
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "x"}],
                  "max_tokens": 4, "stream": True,
                  "logit_bias": {str(i): 1 for i in range(17)}},
            timeout=60,
        )
        assert r.status_code == 400
        assert "logit_bias" in r.json()["error"]["message"]

    def test_json_mode_plus_logprobs_400(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "x"}],
                  "max_tokens": 4, "logprobs": True,
                  "response_format": {"type": "json_object"}},
            timeout=60,
        )
        assert r.status_code == 400

    @pytest.mark.parametrize("bad_n", ["abc", 0, 17])
    def test_bad_n_400(self, server_url, bad_n):
        r = requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "x", "max_tokens": 2, "n": bad_n},
            timeout=60,
        )
        assert r.status_code == 400

    def test_embeddings_token_id_input(self, server_url):
        # OpenAI allows input as one token-id list or a batch of them
        one = requests.post(
            f"{server_url}/v1/embeddings",
            json={"model": "m", "input": [105, 102, 109]}, timeout=120,
        ).json()
        assert len(one["data"]) == 1
        batch = requests.post(
            f"{server_url}/v1/embeddings",
            json={"model": "m", "input": [[105, 102, 109], [106]]},
            timeout=120,
        ).json()
        assert len(batch["data"]) == 2
        assert batch["data"][0]["embedding"] == one["data"][0]["embedding"]
        bad = requests.post(
            f"{server_url}/v1/embeddings",
            json={"model": "m", "input": {"not": "valid"}}, timeout=60,
        )
        assert bad.status_code == 400

    def test_completions_stream_include_usage(self, server_url):
        with requests.post(
            f"{server_url}/v1/completions",
            json={"model": "m", "prompt": "hi", "max_tokens": 4,
                  "temperature": 0.0, "stream": True,
                  "stream_options": {"include_usage": True}},
            stream=True, timeout=120,
        ) as resp:
            usage = None
            for line in resp.iter_lines():
                if not line or line == b"data: [DONE]":
                    continue
                d = json.loads(line[6:])
                if d.get("usage"):
                    usage = d["usage"]
        assert usage is not None and usage["completion_tokens"] == 4

    def test_logprobs_stay_aligned_while_json_mode_active(self, server_url):
        """A logprobs request decoding concurrently with a json_mode
        request must still get one logprobs entry per token."""
        import concurrent.futures as cf

        def json_req():
            return requests.post(
                f"{server_url}/v1/completions",
                json={"model": "m", "prompt": "j", "max_tokens": 40,
                      "temperature": 0.0, "ignore_eos": True,
                      "response_format": {"type": "json_object"}},
                timeout=300,
            ).json()

        def lp_req():
            return requests.post(
                f"{server_url}/v1/completions",
                json={"model": "m", "prompt": "lp", "max_tokens": 8,
                      "temperature": 0.0, "ignore_eos": True,
                      "logprobs": 2},
                timeout=300,
            ).json()

        with cf.ThreadPoolExecutor(2) as ex:
            fj = ex.submit(json_req)
            time.sleep(0.3)  # let the json request occupy the batch
            flp = ex.submit(lp_req)
            lp = flp.result()
            fj.result()
        c = lp["choices"][0]
        assert len(c["logprobs"]["tokens"]) == 8
        assert len(c["logprobs"]["token_logprobs"]) == 8
        assert c["logprobs"]["tokens"] == [
            t for t in c["logprobs"]["tokens"]
        ]  # present and aligned


class TestJsonSchema:
    """OpenAI response_format json_schema / llama.cpp json_schema:
    schema compiled to GBNF and enforced."""

    SCHEMA = {
        "type": "object",
        "properties": {"n": {"type": "integer"}},
        "required": ["n"],
    }

    def test_openai_json_schema_enforced(self, server_url):
        r = requests.post(
            f"{server_url}/v1/chat/completions",
            json={"model": "m",
                  "messages": [{"role": "user", "content": "count"}],
                  "max_tokens": 40, "temperature": 0.0, "ignore_eos": True,
                  "response_format": {
                      "type": "json_schema",
                      "json_schema": {"name": "count", "schema": self.SCHEMA},
                  }},
            timeout=300,
        ).json()
        c = r["choices"][0]
        text = c["message"]["content"]
        if c["finish_reason"] == "stop":
            d = json.loads(text)
            assert isinstance(d["n"], int)
        else:  # cut by max_tokens: still a valid prefix of the schema
            from wrinklefree_tpu.engine.gbnf import GbnfValidator
            from wrinklefree_tpu.engine.schema_to_gbnf import schema_to_gbnf

            assert GbnfValidator(
                schema_to_gbnf(self.SCHEMA)
            ).advance(text) in ("ok", "complete")

    def test_llamacpp_json_schema_enforced(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "c", "n_predict": 40, "temperature": 0.0,
                  "ignore_eos": True, "json_schema": self.SCHEMA},
            timeout=300,
        ).json()
        text = r["content"]
        if r.get("stopped_eos"):
            d = json.loads(text)
            assert isinstance(d["n"], int)
        else:
            from wrinklefree_tpu.engine.gbnf import GbnfValidator
            from wrinklefree_tpu.engine.schema_to_gbnf import schema_to_gbnf

            assert GbnfValidator(
                schema_to_gbnf(self.SCHEMA)
            ).advance(text) in ("ok", "complete")

    def test_empty_schema_is_json_mode(self, server_url):
        from wrinklefree_tpu.engine.json_constraint import JsonPrefixValidator

        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "j", "n_predict": 16, "temperature": 0.0,
                  "json_schema": {}},
            timeout=300,
        ).json()
        assert JsonPrefixValidator().advance(r["content"]) != "dead"

    def test_bad_schema_400(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "x", "n_predict": 4, "json_schema": "not a dict"},
            timeout=60,
        )
        assert r.status_code == 400


class TestTypicalTfs:
    def test_typical_and_tfs_accepted_and_seeded(self, server_url):
        def run():
            return requests.post(
                f"{server_url}/completion",
                json={"prompt": "hello", "n_predict": 6, "temperature": 1.0,
                      "seed": 5, "typical_p": 0.5, "tfs_z": 0.9},
                timeout=120,
            ).json()["content"]

        assert run() == run()  # seeded + filtered: reproducible


class TestTimings:
    def test_llamacpp_timings_block(self, server_url):
        r = requests.post(
            f"{server_url}/completion",
            json={"prompt": "hello", "n_predict": 4, "temperature": 0.0},
            timeout=120,
        ).json()
        t = r["timings"]
        assert t["predicted_n"] == 4
        assert t["prompt_n"] >= 1
        assert t["prompt_ms"] > 0 and t["predicted_ms"] >= 0
        assert "predicted_per_second" in t


class TestMirostatServer:
    def test_mirostat_request_seeded(self, server_url):
        def run():
            return requests.post(
                f"{server_url}/completion",
                json={"prompt": "hello", "n_predict": 8, "temperature": 1.0,
                      "seed": 11, "mirostat": 2, "mirostat_tau": 4.0,
                      "mirostat_eta": 0.2},
                timeout=120,
            ).json()["content"]

        a = run()
        assert len(a) > 0 and a == run()


def _spin(server):
    """Run an InferenceServer's app on a real socket in a daemon thread;
    returns (url, stop)."""
    from aiohttp import web

    from wrinklefree_tpu.server.http import build_app

    port = _free_port()
    app = build_app(server)
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    for _ in range(200):
        try:
            if requests.get(f"{url}/health", timeout=1).status_code == 200:
                break
        except requests.RequestException:
            time.sleep(0.1)
    else:
        pytest.fail("server did not come up")

    def stop():
        loop.call_soon_threadsafe(loop.stop)
        server.async_engine.shutdown()  # leaked scheduler threads drag CPU

    return url, stop


@pytest.fixture(scope="module")
def dp_server_url():
    url, stop = _spin(create_server(tiny=True, use_pallas=False, dp=2))
    yield url
    stop()


class TestDataParallel:
    """--dp N serving (VERDICT r2 item 8): engine replicas behind the
    least-loaded router; distribution observable via /slots + /stats."""

    def test_dp_requests_distribute_across_replicas(self, dp_server_url):
        url = dp_server_url
        from concurrent.futures import ThreadPoolExecutor

        def gen(i):
            return requests.post(
                f"{url}/v1/completions",
                json={"model": "m", "prompt": f"hello {i}",
                      "max_tokens": 24, "temperature": 0.0},
                timeout=120,
            ).status_code

        with ThreadPoolExecutor(6) as ex:
            assert all(c == 200 for c in ex.map(gen, range(6)))
        stats = requests.get(f"{url}/stats", timeout=10).json()
        assert stats["replicas"] == 2
        # least-loaded + tie rotation: every replica serves some share
        assert all(c >= 1 for c in stats["per_replica_requests"]), stats

    def test_dp_slots_show_replica(self, dp_server_url):
        slots = requests.get(f"{dp_server_url}/slots", timeout=10).json()
        assert len({s["id"] for s in slots}) == len(slots)  # globally unique
        assert {s["replica"] for s in slots} == {0, 1}

    def test_dp_metrics_aggregate(self, dp_server_url):
        text = requests.get(f"{dp_server_url}/metrics", timeout=10).text
        assert "wf_replicas 2" in text


@pytest.fixture(scope="module")
def tp_server_url():
    url, stop = _spin(create_server(tiny=True, use_pallas=False, tp=2))
    yield url
    stop()


class TestEmbeddingsUnderTP:
    """r2 weak item 8: /v1/embeddings used to reject tp > 1; now the
    embed program runs single-device from the unsharded snapshot."""

    def test_embeddings_tp2(self, tp_server_url):
        r = requests.post(
            f"{tp_server_url}/v1/embeddings",
            json={"input": "hello world"},
            timeout=120,
        )
        assert r.status_code == 200, r.text
        emb = r.json()["data"][0]["embedding"]
        import numpy as np

        n = float(np.linalg.norm(np.asarray(emb)))
        assert abs(n - 1.0) < 1e-3  # L2-normalized

    def test_tp2_generation_still_works(self, tp_server_url):
        r = requests.post(
            f"{tp_server_url}/v1/completions",
            json={"model": "m", "prompt": "hi", "max_tokens": 4,
                  "temperature": 0.0},
            timeout=120,
        )
        assert r.status_code == 200, r.text
