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
