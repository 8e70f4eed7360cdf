"""Loader/registry tests with synthetic checkpoint dirs (the reference's
mocked-weights test strategy, SURVEY §4 category 1)."""

import json

import numpy as np
import pytest
from safetensors.numpy import save_file

from mlx_audio_tpu import utils
from mlx_audio_tpu import nn


def test_from_dict_filters_unknown_and_nested():
    import dataclasses

    @dataclasses.dataclass
    class Inner:
        a: int = 1

    @dataclasses.dataclass
    class Cfg:
        x: int = 0
        inner: Inner = None

    c = utils.from_dict(Cfg, {"x": 5, "inner": {"a": 7}, "junk": True})
    assert c.x == 5 and c.inner.a == 7


def test_load_config_and_weights(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "test", "dim": 4}))
    save_file({"w": np.ones((2, 2), np.float32)}, str(tmp_path / "model.safetensors"))
    cfg = utils.load_config(tmp_path)
    assert cfg["model_type"] == "test"
    w = utils.load_weight_files(tmp_path)
    assert w["w"].shape == (2, 2)


def test_load_weights_npz(tmp_path):
    np.savez(tmp_path / "weights.npz", a=np.zeros(3, np.float32))
    w = utils.load_weight_files(tmp_path)
    assert "a" in w


def test_missing_weights_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        utils.load_weight_files(tmp_path)


def test_apply_quantization_scales_driven(tmp_path):
    class M(nn.Module):
        def __init__(self):
            self.proj = nn.Linear(64, 64)
            self.head = nn.Linear(64, 64)

        def __call__(self, x):
            return self.head(self.proj(x))

    m = M()
    weights = {"proj.scales": np.ones((64, 2))}  # only proj was quantized
    config = {"quantization": {"group_size": 32, "bits": 4}}
    m = utils.apply_quantization(m, config, weights)
    assert isinstance(m.proj, nn.QuantizedLinear)
    assert isinstance(m.head, nn.Linear)


def test_get_model_path_local_missing():
    with pytest.raises(FileNotFoundError):
        utils.get_model_path("/nonexistent/model/dir")


def test_resample_audio():
    x = np.sin(2 * np.pi * 100 * np.arange(16000) / 16000).astype(np.float32)
    y = utils.resample_audio(x, 16000, 24000)
    assert abs(len(y) - 24000) <= 1
