"""Unit tests for core types, exceptions, and interfaces."""

import pytest

from adaptive_sd_tpu.core import (
    AdaptiveSDError,
    ComponentFactory,
    ConfigurationError,
    ExceptionHandler,
    HealthCheckMixin,
    ModelLoadError,
    ProcessingResult,
    RequestContext,
    handle_exceptions,
)


class TestRequestContext:
    def test_defaults(self):
        r = RequestContext(prompt="hello")
        assert r.request_id and r.max_tokens == 256 and r.temperature == 0.0

    @pytest.mark.parametrize(
        "kwargs",
        [
            {"prompt": ""},
            {"prompt": "   "},
            {"prompt": "x", "max_tokens": 0},
            {"prompt": "x", "temperature": -1},
            {"prompt": "x", "top_p": 0.0},
            {"prompt": "x", "top_p": 1.5},
            {"prompt": "x", "lambda_override": -3.0},
        ],
    )
    def test_validation(self, kwargs):
        with pytest.raises(ValueError):
            RequestContext(**kwargs)

    def test_unique_ids(self):
        assert RequestContext(prompt="a").request_id != RequestContext(prompt="a").request_id


class TestProcessingResult:
    def test_succeeded(self):
        ok = ProcessingResult("r", "t", 0, "7b", 0.1, 1.0)
        bad = ProcessingResult("r", "", 0, "7b", 0.1, 1.0, error="boom")
        assert ok.succeeded and not bad.succeeded


class TestExceptions:
    def test_to_dict(self):
        e = ConfigurationError("bad", details={"key": "v"})
        d = e.to_dict()
        assert d["error_code"] == "CONFIGURATION_ERROR" and d["details"] == {"key": "v"}

    def test_cause_chain(self):
        try:
            raise ValueError("inner")
        except ValueError as inner:
            e = ModelLoadError("outer", cause=inner)
        assert e.cause is not None and e.traceback_str

    def test_handler_registry_mro_dispatch(self):
        h = ExceptionHandler()
        h.register(AdaptiveSDError, lambda e: "base")
        assert h.handle(ConfigurationError("x")) == "base"
        h.register(ConfigurationError, lambda e: "specific")
        assert h.handle(ConfigurationError("x")) == "specific"
        with pytest.raises(KeyError):
            h.handle(KeyError("unhandled"))

    def test_handle_exceptions_decorator(self):
        @handle_exceptions(reraise_as=ModelLoadError)
        def boom():
            raise RuntimeError("nope")

        with pytest.raises(ModelLoadError):
            boom()

        @handle_exceptions(swallow=True, default=42)
        def soft():
            raise RuntimeError("nope")

        assert soft() == 42


class TestComponentFactory:
    def test_register_create(self):
        f = ComponentFactory()
        f.register("predictor", "mlp", lambda dim: {"dim": dim})
        assert f.create("predictor", "mlp", 64) == {"dim": 64}
        assert list(f.known("predictor")) == ["mlp"]
        with pytest.raises(KeyError):
            f.create("predictor", "missing")


class TestHealthCheck:
    def test_mixin(self):
        class Svc(HealthCheckMixin):
            def _health_db(self):
                return True

            def _health_gpu(self):
                raise RuntimeError

        r = Svc().health_check()
        assert r["checks"] == {"db": True, "gpu": False} and not r["healthy"]
