"""Stress tests: concurrency ladder, sustained load, recovery after a
burst, latency percentiles (reference analog: tests/test_stress.py —
10/25/50/100 concurrent, sustained load, recovery-after-burst,
p50/p95/p99 — but self-hosted on the tiny model, so they run in CI)."""

import asyncio
import concurrent.futures as cf
import socket
import threading
import time

import numpy as np
import pytest
import requests

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
    server.async_engine.shutdown()  # leaked scheduler threads drag CPU


def _one(url, prompt="hello", max_tokens=4):
    t0 = time.perf_counter()
    r = requests.post(
        f"{url}/v1/completions",
        json={"model": "m", "prompt": prompt, "max_tokens": max_tokens,
              "temperature": 0.0},
        timeout=300,
    )
    dt = time.perf_counter() - t0
    return r.status_code, dt, r.json()


class TestConcurrencyLadder:
    """Rising concurrency over 4 engine slots: every request must
    succeed (continuous batching admits in waves; none dropped)."""

    @pytest.mark.parametrize("n", [8, 16, 32])
    def test_ladder(self, server_url, n):
        with cf.ThreadPoolExecutor(n) as ex:
            results = list(ex.map(
                lambda i: _one(server_url, prompt=f"req {i}"), range(n)
            ))
        codes = [c for c, _, _ in results]
        assert codes == [200] * n
        # all decoded the requested number of tokens
        for _, _, body in results:
            assert body["usage"]["completion_tokens"] == 4


class TestSustainedLoad:
    def test_sustained_and_percentiles(self, server_url):
        """~6s of closed-loop load from 8 workers; p50/p95 computed the
        way the reference's BenchmarkMetrics does (from raw latencies)."""
        stop_at = time.perf_counter() + 6.0
        lats, errs = [], []

        def worker(i):
            while time.perf_counter() < stop_at:
                code, dt, _ = _one(server_url, prompt=f"w{i}", max_tokens=2)
                (lats if code == 200 else errs).append(dt)

        with cf.ThreadPoolExecutor(8) as ex:
            list(ex.map(worker, range(8)))
        assert not errs
        assert len(lats) >= 16  # sustained throughput, not a stall
        p50, p95 = np.percentile(lats, [50, 95])
        assert p50 <= p95
        assert p95 < 60.0  # sanity ceiling, not a perf target

    def test_recovery_after_burst(self, server_url):
        """After a 32-request burst the server answers a single request
        at normal latency (no leaked slots / stuck queue)."""
        with cf.ThreadPoolExecutor(32) as ex:
            list(ex.map(lambda i: _one(server_url, max_tokens=2), range(32)))
        code, dt, body = _one(server_url, prompt="after", max_tokens=4)
        assert code == 200
        assert body["usage"]["completion_tokens"] == 4
        # queue drained: /slots shows no stuck decodes shortly after
        for _ in range(50):
            slots = requests.get(f"{server_url}/slots", timeout=30).json()
            if all(s["state"] == "idle" for s in slots):
                break
            time.sleep(0.1)
        else:
            pytest.fail(f"slots never drained: {slots}")
