"""Bench harness unit tests (reference analogs: test_benchmark_runner.py
metrics-from-latencies + cost math + report gen; memory_profiler bandwidth
utilization)."""

import json

from wrinklefree_tpu.bench.cost import CostMetrics, HARDWARE_PRICING
from wrinklefree_tpu.bench.metrics import BenchmarkMetrics
from wrinklefree_tpu.bench.report import render_markdown, write_report
from wrinklefree_tpu.bench.roofline import (
    TPU_SPECS,
    decode_step_traffic,
    roofline,
    speed_of_light_toks,
    ternary_matmul_traffic,
)
from wrinklefree_tpu.config import BitNetConfig


class TestRoofline:
    def test_traffic_counts_packed_weights(self):
        t = ternary_matmul_traffic(1, 2560, 2560)
        assert t["bytes"] == 2560 * 2560 / 4 + 2560 + 2560 * 2
        assert t["flops"] == 2 * 2560 * 2560

    def test_memory_bound_at_batch1(self):
        t = ternary_matmul_traffic(1, 2560, 2560)
        pt = roofline("gemv", 50e-6, t["bytes"], t["flops"], chip="v5e")
        assert pt.bound == "memory"
        assert 0 < pt.bw_utilization < 1

    def test_compute_bound_at_large_batch(self):
        t = ternary_matmul_traffic(4096, 4096, 4096)
        pt = roofline("gemm", 1e-3, t["bytes"], t["flops"], chip="v5e")
        assert pt.bound == "compute"

    def test_speed_of_light_2b(self):
        """BitNet-2B weights ~ 0.55 GB packed: v5e HBM at 819 GB/s gives a
        batch-1 bound in the several-hundred tok/s range — far above the
        reference CPU's 26.9 (BASELINE.md)."""
        sol = speed_of_light_toks(BitNetConfig.bitnet_2b(), 1, 512, chip="v5e")
        assert 200 < sol < 3000

    def test_decode_traffic_scales_with_context(self):
        cfg = BitNetConfig.bitnet_2b()
        t1 = decode_step_traffic(cfg, 1, 128)
        t2 = decode_step_traffic(cfg, 1, 4096)
        assert t2["bytes"] > t1["bytes"]

    def test_specs_have_all_chips(self):
        for k in ("v4", "v5e", "v5p", "v6e", "cpu"):
            assert {"bf16_flops", "int8_ops", "hbm_bw"} <= set(TPU_SPECS[k])


class TestReport:
    def _metrics(self):
        return BenchmarkMetrics.from_latencies(
            [0.5, 0.6, 0.7], ttfts_s=[0.1, 0.12, 0.15],
            total_tokens=192, total_time_s=1.8,
        )

    def test_render_contains_sections(self):
        cost = CostMetrics(tokens_per_second=100.0,
                           hourly_cost=HARDWARE_PRICING["tpu-v5e-1"])
        md = render_markdown(
            "test-bench", self._metrics(), cost,
            roofline_points=[roofline("k", 1e-3, 1e9, 1e9, chip="v5e").as_dict()],
            notes={"chip": "v5e"},
        )
        for section in ("Throughput & latency", "Cost", "Kernel roofline", "Notes"):
            assert section in md
        assert "$/1M tokens" in md

    def test_write_report_files(self, tmp_path):
        paths = write_report(tmp_path, "unit", self._metrics())
        assert paths["json"].exists() and paths["markdown"].exists()
        payload = json.loads(paths["json"].read_text())
        assert payload["metrics"]["num_requests"] == 3
        assert "# unit" in paths["markdown"].read_text()


class TestBenchSupervisor:
    """bench.py's retry supervisor (VERDICT r3 item 1): forwards the
    child's JSON line on success, emits a structured error line (never a
    bare traceback) on terminal failure."""

    def _load(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "wf_bench", Path(__file__).resolve().parent.parent / "bench.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_success_forwards_json(self, capsys, monkeypatch):
        mod = self._load()
        line = json.dumps({"metric": "x", "value": 42.0})
        monkeypatch.setattr(
            mod, "_run_attempt", lambda t: (0, f"noise\n{line}\n", "")
        )
        assert mod._supervise() == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(out)["value"] == 42.0

    def test_terminal_failure_emits_structured_error(self, capsys,
                                                     monkeypatch):
        mod = self._load()
        monkeypatch.setenv("WF_BENCH_ATTEMPTS", "2")
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        monkeypatch.setattr(
            mod, "_run_attempt", lambda t: (1, "", "boom: TPU unavailable")
        )
        assert mod._supervise() == 1
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["value"] is None and "boom" in rec["error"]
        assert rec["attempts"] == 2

    def test_retry_recovers_after_transient_failure(self, capsys,
                                                    monkeypatch):
        mod = self._load()
        monkeypatch.setenv("WF_BENCH_ATTEMPTS", "3")
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        calls = {"n": 0}
        line = json.dumps({"metric": "x", "value": 7.0})

        def attempt(t):
            calls["n"] += 1
            if calls["n"] < 3:
                return -9, "", "timeout"
            return 0, line + "\n", ""

        monkeypatch.setattr(mod, "_run_attempt", attempt)
        assert mod._supervise() == 0
        assert calls["n"] == 3
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(out)["value"] == 7.0
