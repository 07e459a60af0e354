"""Config-system tests (the reference's only real test target — ours run)."""

import os

import pytest

from adaptive_sd_tpu.config import (
    BaseConfig,
    CascadeConfig,
    ConfigManager,
    OptimizationConfig,
    QualityConfig,
    ServerConfig,
    ServingConfig,
    StageConfig,
)
from adaptive_sd_tpu.core.exceptions import ConfigurationError
from dataclasses import dataclass, field


@dataclass
class _Demo(BaseConfig):
    name: str = "x"
    count: int = 1
    ratio: float = 0.5
    flags: tuple[str, ...] = ("a",)
    nested: ServerConfig = field(default_factory=ServerConfig)


class TestBaseConfig:
    def test_dict_roundtrip(self):
        c = _Demo.from_dict({"name": "y", "count": 3, "nested": {"port": 9000}})
        assert c.name == "y" and c.count == 3 and c.nested.port == 9000
        d = c.to_dict()
        assert d["nested"]["port"] == 9000

    def test_unknown_key_rejected(self):
        with pytest.raises(ConfigurationError):
            _Demo.from_dict({"nope": 1})

    def test_yaml_roundtrip(self, tmp_path):
        c = _Demo(name="z", count=7)
        p = tmp_path / "c.yaml"
        c.save_yaml(p)
        c2 = _Demo.from_yaml(p)
        assert c2.name == "z" and c2.count == 7

    def test_missing_yaml_raises(self):
        with pytest.raises(ConfigurationError):
            _Demo.from_yaml("/nonexistent/file.yaml")

    def test_env_parsing(self, monkeypatch):
        monkeypatch.setenv("ADAPTIVE_SD_COUNT", "9")
        monkeypatch.setenv("ADAPTIVE_SD_RATIO", "0.25")
        monkeypatch.setenv("ADAPTIVE_SD_NESTED__PORT", "1234")
        c = _Demo.from_env()
        assert c.count == 9 and c.ratio == 0.25 and c.nested.port == 1234

    def test_merge_deep(self):
        c = _Demo()
        c2 = c.merge({"nested": {"port": 4444}, "count": 5})
        assert c2.nested.port == 4444 and c2.count == 5
        assert c2.nested.host == c.nested.host  # untouched


class TestSchemas:
    def test_stage_validation(self):
        StageConfig(name="7b", dp=1, tp=2, device_ids=(0, 1)).validate()
        with pytest.raises(ConfigurationError):
            StageConfig(name="7b", bits=5).validate()
        with pytest.raises(ConfigurationError):
            StageConfig(name="7b", tp=2, device_ids=(0,)).validate()
        with pytest.raises(ConfigurationError):
            StageConfig(name="7b", page_size=100).validate()

    def test_cascade_overlap_rejected(self):
        cfg = CascadeConfig(
            stages=[
                StageConfig(name="a", device_ids=(0,), cost_per_token=1.0),
                StageConfig(name="b", device_ids=(0,), cost_per_token=2.0),
            ]
        )
        with pytest.raises(ConfigurationError):
            cfg.validate()

    def test_cascade_cost_monotonicity(self):
        cfg = CascadeConfig(
            stages=[
                StageConfig(name="a", cost_per_token=5.0),
                StageConfig(name="b", cost_per_token=1.0),
            ]
        )
        with pytest.raises(ConfigurationError):
            cfg.validate()

    def test_quality_weights_sum(self):
        with pytest.raises(ConfigurationError):
            QualityConfig(bleu_weight=0.9, rouge_weight=0.9, task_weight=0.9).validate()
        QualityConfig().validate()

    def test_optimization_lambda_bounds(self):
        with pytest.raises(ConfigurationError):
            OptimizationConfig(lambda_value=1000).validate()

    def test_serving_tree_validates_children(self):
        s = ServingConfig()
        s.validate()
        s.server.port = -1
        with pytest.raises(ConfigurationError):
            s.validate()

    def test_server_preemption_mode_validated(self):
        ServerConfig(preemption_mode="swap").validate()
        with pytest.raises(ConfigurationError):
            ServerConfig(preemption_mode="drop").validate()


class TestConfigManager:
    def test_yaml_env_default_resolution(self, tmp_path, monkeypatch):
        (tmp_path / "serving.yaml").write_text("server:\n  port: 7777\n")
        mgr = ConfigManager(str(tmp_path))
        cfg = mgr.load("serving", ServingConfig)
        assert cfg.server.port == 7777
        # cached
        assert mgr.load("serving", ServingConfig) is cfg
        # defaults when file missing
        cfg2 = mgr.load("missing", ServerConfig)
        assert cfg2.port == 8000

    def test_env_overlay(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ADAPTIVE_SD_SERVING__SERVER__PORT", "3333")
        mgr = ConfigManager(str(tmp_path))
        cfg = mgr.load("serving", ServingConfig)
        assert cfg.server.port == 3333
