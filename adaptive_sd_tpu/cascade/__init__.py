from .cache_manager import CacheEntry, CascadeCacheManager
from .pipeline import AdaptiveCascadePipeline, PipelineConfig
from .stages import EngineTextStage, MockStage, StageManager, TextStage

__all__ = [name for name in dir() if not name.startswith("_")]
