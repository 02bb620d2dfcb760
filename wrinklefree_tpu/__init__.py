"""wrinklefree_tpu — TPU-native 1.58-bit (ternary) LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DeepOpt-com/WrinkleFree-Inference-Engine (CPU AVX engine) for TPU:

- ternary packed weights with fused dequant matmul Pallas kernels
- BitNet b1.58 model family loaded straight from HF safetensors
- paged, quantizable KV cache in HBM with flash decode
- continuous-batching engine with radix prefix cache (native C++ core)
- OpenAI-compatible serving, benchmark/cost harness
- TP/DP/EP sharding over jax.sharding.Mesh
"""

__version__ = "0.1.0"

# jax 0.9.0 ignores the JAX_COMPILATION_CACHE_DIR env var (the config
# holder has no env hook) — apply it through jax.config here so every
# entrypoint (bench, serving, server, labs) gets the persistent cache
# it thought it was getting. Root cause of the 170 s cold compiles in
# BENCH_r04.json (VERDICT r4 item 7). No-op when the var is unset or
# the config was already applied (tests' conftest).
from .utils.jaxcache import enable_persistent_cache as _epc

_epc()
del _epc
