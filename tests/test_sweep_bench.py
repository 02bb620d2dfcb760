"""Sweep harness + synthetic-geometry server path.

The sweep suite replaces the reference's Modal cloud benches
(/root/reference/legacy/modal/modal_extended_benchmark.py — batch /
long-context / mixed prefill+decode campaigns, deprecated upstream in
favour of local execution per its README). The `synth:` model path
backs cold-boot/TTFT measurement at real geometry without egress.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def test_sweep_single_point_tiny(tmp_path):
    p = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "sweep_bench.py"),
         "--grid", "batch", "--tiny", "--values", "2",
         "--timeout", "240", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300, cwd=ROOT)
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    assert summary["points"] == 1 and summary["errors"] == 0
    raw = json.loads(Path(summary["raw"]).read_text())
    row = raw["rows"][0]
    assert row["streams"] == 2 and row["decode_tok_s"] > 0
    md = Path(summary["report"]).read_text()
    assert "decode tok/s" in md


@pytest.mark.parametrize("grid", ["batch", "context", "mixed"])
def test_sweep_grids_defined(grid):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sweep_bench", ROOT / "scripts" / "sweep_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    axis, values, fixed = mod.GRIDS[grid]
    assert axis.startswith("--") and len(values) >= 4
    assert grid in mod.TINY_VALUES and grid in mod.TINY_FIXED


def test_synth_model_server_boots():
    """create_server('synth:tiny') builds a random-weight server at the
    named geometry (real-geometry cold-boot measurement path)."""
    from wrinklefree_tpu.config import EngineConfig
    from wrinklefree_tpu.server.http import create_server

    server = create_server(
        "synth:tiny", use_pallas=False,
        engine_config=EngineConfig(
            max_batch_slots=4, page_size=8, num_pages=64, max_context=128,
            prefill_buckets=(16,)),
    )
    try:
        assert server.model_name == "synth:tiny"
        eng = server.async_engine.engines[0]
        assert eng.cfg.num_layers == 2  # tiny geometry
    finally:
        server.async_engine.shutdown()


def test_synth_model_unknown_geometry_raises():
    from wrinklefree_tpu.server.http import create_server

    with pytest.raises(AttributeError):
        create_server("synth:nope")
