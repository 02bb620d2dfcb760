"""Server lifecycle manager, model validation, params patcher.

Reference analogs: legacy/src/server/bitnet_server.py:48-137 (spawn,
ready-poll, dead-process detection, terminate->kill),
bitnet_quantization.py:468-514 (validate_bitnet_model),
kernels/bitnet_patch.py:165-210 (patch any model's linears).
"""

import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_convert import _make_model_dir
from wrinklefree_tpu.convert.validate import validate_model
from wrinklefree_tpu.models.patcher import (
    TernaryParam,
    ternarize_tree,
    ternary_apply,
)
from wrinklefree_tpu.server.manager import ServerDiedError, ServerManager


class TestValidateModel:
    def test_valid_ternary_float_dir(self, tmp_path):
        d = _make_model_dir(tmp_path, dtype="ternary_float")
        rep = validate_model(d)
        assert rep["valid"], rep["errors"]
        assert rep["float_ternary"] == 14

    def test_valid_packed_dir(self, tmp_path):
        from wrinklefree_tpu.convert import convert_and_save

        d = _make_model_dir(tmp_path, dtype="ternary_float")
        out = tmp_path / "packed"
        convert_and_save(d, out)
        rep = validate_model(out)
        assert rep["valid"], rep["errors"]
        assert rep["packed"] == 14

    def test_dense_float_flagged(self, tmp_path):
        d = _make_model_dir(tmp_path, dtype="dense_float")
        rep = validate_model(d)
        assert not rep["valid"]
        assert any("dense float" in e for e in rep["errors"])

    def test_missing_config(self, tmp_path):
        rep = validate_model(tmp_path)
        assert not rep["valid"] and "missing config.json" in rep["errors"]


class TestPatcher:
    def test_patches_matching_leaves(self):
        rng = np.random.default_rng(0)
        tree = {
            "layer0": {"q_proj": jnp.asarray(rng.normal(0, 0.02, (64, 64)), jnp.float32)},
            "ln": jnp.ones((64,), jnp.float32),  # 1-D: untouched
            "head": jnp.asarray(rng.normal(0, 0.02, (64, 64)), jnp.float32),  # no match
        }
        patched, n = ternarize_tree(tree, patterns=(r".*q_proj.*",))
        assert n == 1
        assert isinstance(patched["layer0"]["q_proj"], TernaryParam)
        assert patched["head"].shape == (64, 64)

    def test_apply_matches_reference_quantization(self):
        from wrinklefree_tpu.ops.ternary import (
            quantize_weights_ternary,
            ternary_linear,
            pack_ternary_np,
        )

        rng = np.random.default_rng(1)
        w = rng.normal(0, 0.02, (64, 32)).astype(np.float32)
        tree, n = ternarize_tree({"x_proj": jnp.asarray(w)}, patterns=(r".*x_proj",))
        assert n == 1
        x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.bfloat16)
        out = ternary_apply(x, tree["x_proj"])
        tern, scale = quantize_weights_ternary(w)
        ref = ternary_linear(x, jnp.asarray(pack_ternary_np(tern)), jnp.float32(scale))
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )


@pytest.mark.slow
class TestServerManager:
    def test_full_lifecycle(self):
        mgr = ServerManager(args=["--tiny"], port=30981,
                            env={"JAX_PLATFORMS": "cpu"})
        with mgr:
            assert mgr.is_alive()
            with urllib.request.urlopen(f"{mgr.url}/health", timeout=5) as r:
                assert r.status == 200
        assert not mgr.is_alive()

    def test_dead_process_detected(self):
        mgr = ServerManager(args=["--bogus-flag-that-does-not-exist"], port=30982)
        with pytest.raises((ServerDiedError, TimeoutError)):
            mgr.start(startup_timeout=60)
        assert not mgr.is_alive()
