from .allocator import AllocatorStats, PageAllocator
from .decode import GenerationOutput, TierEngine
from .kv_cache import PagedKVCache

__all__ = [name for name in dir() if not name.startswith("_")]
