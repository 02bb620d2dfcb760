from .paged import PagedKV, paged_forward
from .quantized import KV_DTYPES, dequantize_kv, quantize_kv
