from .config import (
    DEFAULT_CASCADE,
    REGISTRY,
    TINY,
    TINY128,
    ModelSpec,
    get_spec,
    scaled_spec,
)
from .qwen import decode_step, init_params, prefill, quantize_model

__all__ = [name for name in dir() if not name.startswith("_")]
