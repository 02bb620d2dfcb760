from .cache_key import PACK_FORMAT, compute_cache_key
from .gguf import convert_hf_to_gguf, read_gguf, validate_gguf, write_gguf
from .convert import convert_and_save
from .loader import get_cached_or_convert, list_cached_models
