from .bitnet import KVCache, forward, forward_jit, generate, init_params
from .loader import load_params
