"""Black-box KV-cache validator against the in-process tiny server
(reference tests/test_kv_cache.py drives the same three probes —
prefix-cache speedup, context-limit grace, concurrent success — via
kv_cache/validator.py)."""

import pytest

from tests.test_server import server_url  # noqa: F401  (fixture)
from wrinklefree_tpu.kv.validator import KVCacheMetrics, KVCacheValidator


class TestValidator:
    def test_context_limit_graceful(self, server_url):  # noqa: F811
        v = KVCacheValidator(server_url)
        assert v.validate_context_limits() is True

    def test_concurrent_success(self, server_url):  # noqa: F811
        v = KVCacheValidator(server_url)
        assert v.validate_continuous_batching(n=6) == 1.0

    def test_prefix_caching_probe(self, server_url):  # noqa: F811
        v = KVCacheValidator(server_url)
        # tiny model/context: just require the probe to run and return a
        # sane positive ratio (radix speedups need real prompt lengths)
        speedup = v.validate_prefix_caching(prefix_len=90, trials=2)
        assert speedup > 0

    def test_metrics_pass_logic(self):
        ok = KVCacheMetrics(1.5, True, 1.0)
        bad = KVCacheMetrics(0.2, True, 1.0)
        assert ok.passed and not bad.passed
