from .logging_utils import (
    ColoredFormatter,
    ContextLogger,
    LoggerMixin,
    PerformanceLogger,
    StructuredFormatter,
    log_function_call,
    setup_logging,
)
from .profiler import CostModel, CostProfiler, MeasurementConfig, MeasurementResult
from .taxonomy import AdvancedTaskClassifier, TaskClassifier
from .timing import (
    Deadline,
    XprofTrace,
    PerformanceProfiler,
    RateLimiter,
    Timer,
    global_profiler,
    timed,
    timed_async,
    with_timeout,
)
from .validation import (
    DictValidator,
    ListValidator,
    NumericValidator,
    StringValidator,
    Validator,
    validate_config,
    validate_json,
    validate_path,
    validate_prompt,
    validate_yaml,
)

__all__ = [name for name in dir() if not name.startswith("_")]
