from .ternary import (
    pack_ternary,
    pack_ternary_np,
    unpack_ternary,
    unpack_ternary_np,
    unpack_hf_packed,
    hf_packed_to_wf,
    quantize_activations,
    quantize_weights_ternary,
    ternary_matmul_reference,
    ternary_linear,
)
