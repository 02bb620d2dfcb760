"""Ternarize arbitrary parameter trees (the "model patcher").

Analog of the reference's model patcher (reference
kernels/bitnet_patch.py:165-210 — swaps nn.Linear modules for native
-kernel modules in ANY transformers model). The JAX equivalent operates
on pytrees: any 2-D float leaf whose path matches the patterns is
replaced by a `TernaryParam` (packed qweight + scale), and
`ternary_apply` is the drop-in matmul for it — so any flax/haiku/pytree
model can run its linears through the fused ternary path.
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ternary import (
    pack_ternary_np,
    quantize_weights_ternary,
    ternary_linear,
)

DEFAULT_PATTERNS = (
    r".*(q|k|v|o)_proj.*", r".*(gate|up|down)_proj.*",
    r".*attention.*(query|key|value|dense).*", r".*mlp.*",
)


class TernaryParam(NamedTuple):
    """Packed replacement for a [K, N] float weight."""

    qweight: jax.Array  # [K//4, N] uint8
    scale: jax.Array  # scalar f32


def ternarize_tree(
    params: Any,
    patterns: Sequence[str] = DEFAULT_PATTERNS,
    min_size: int = 1024,
) -> Tuple[Any, int]:
    """Replace matching 2-D float leaves with TernaryParam.

    Weights are interpreted as [K, N] (inputs-first); transpose
    torch-convention [out, in] weights before calling. Returns
    (new_tree, num_patched).
    """
    regexes = [re.compile(p) for p in patterns]
    count = 0

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        is_target = (
            hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.size >= min_size
            and leaf.shape[0] % 4 == 0
            and any(r.match(name) for r in regexes)
        )
        if is_target:
            tern, scale = quantize_weights_ternary(np.asarray(leaf, np.float32))
            leaves.append(
                TernaryParam(jnp.asarray(pack_ternary_np(tern)), jnp.float32(scale))
            )
            count += 1
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), count


def ternary_apply(
    x: jax.Array, p: TernaryParam, out_dtype=jnp.bfloat16, kernel=None
) -> jax.Array:
    """Drop-in x @ W for a patched weight."""
    return ternary_linear(x, p.qweight, p.scale, out_dtype=out_dtype, kernel=kernel)
