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


def test_mixed_bit_checkpoint_loads_and_matches_dequant(tmp_path):
    """convert --q-recipe mixed_3_6 → apply_quantization honors the per-path
    override block → quantized forward matches the dequantized weights."""
    import jax.numpy as jnp

    from mlx_audio_tpu import convert as cv
    from mlx_audio_tpu.nn.module import load_weights

    rng = np.random.default_rng(2)
    src = tmp_path / "src"
    src.mkdir()
    w = {
        "proj.weight": rng.standard_normal((64, 64)).astype(np.float32),
        "embed_head.weight": rng.standard_normal((64, 64)).astype(np.float32),
    }
    save_file(w, str(src / "model.safetensors"))
    (src / "config.json").write_text(json.dumps({"model_type": "kokoro"}))
    out = cv.convert(str(src), str(tmp_path / "q"), quantize=True, q_bits=3,
                     q_group_size=32, q_recipe="mixed_3_6")
    config = json.loads((out / "config.json").read_text())
    assert config["quantization"]["embed_head"]["bits"] == 6

    class M(nn.Module):
        def __init__(self):
            self.proj = nn.Linear(64, 64, bias=False)
            self.embed_head = nn.Linear(64, 64, bias=False)

        def __call__(self, x):
            return self.embed_head(self.proj(x))

    qweights = utils.load_weight_files(out)
    m = utils.apply_quantization(M(), config, qweights)
    assert m.proj.bits == 3 and m.embed_head.bits == 6
    m = load_weights(m, qweights, strict=True)

    deq = cv.convert(str(out), str(tmp_path / "dq"), dequantize=True)
    fw = utils.load_weight_files(deq)
    mf = load_weights(M(), fw, strict=True)

    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(m(x)), np.asarray(mf(x)), atol=1e-4, rtol=1e-4
    )


def test_audio_volume_normalize_and_load_audio_options(tmp_path):
    """Reference utils.py:443-505 volume normalization and the
    length/volume_normalize/segment_duration load_audio options."""
    import numpy as np

    from mlx_audio_tpu import audio_io
    from mlx_audio_tpu.utils import (
        audio_volume_normalize,
        load_audio,
        random_select_audio_segment,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32) * 0.01
    y = audio_volume_normalize(x, coeff=0.2)
    top = np.sort(np.abs(y))
    top = top[top > 0.01]
    vol = top[int(0.9 * len(top)): int(0.99 * len(top))].mean()
    assert abs(vol - 0.2) < 0.05 or np.abs(y).max() == 1.0
    assert np.abs(y).max() <= 1.0

    seg = random_select_audio_segment(x, 32000)
    assert seg.shape == (32000,)  # padded up
    seg2 = random_select_audio_segment(x, 4000)
    assert seg2.shape == (4000,)

    p = tmp_path / "a.wav"
    audio_io.write(str(p), x, 16000)
    got = load_audio(p, sample_rate=16000, length=20000)
    assert got.shape == (20000,) and np.allclose(got[16000:], 0)
    got2 = load_audio(p, sample_rate=16000, segment_duration=0.5,
                      volume_normalize=True)
    assert got2.shape == (8000,) and np.abs(got2).max() <= 1.0


def test_model_category_from_name_hints():
    """Top-level load_model falls back to repo-name hints when config has
    no model_type (reference utils.py:619-704)."""
    from mlx_audio_tpu.utils import get_model_category, get_model_name_parts

    assert get_model_name_parts("org/Whisper-Large-V3") == \
        ["whisper", "large", "v3"]
    assert get_model_category(None, ["whisper", "tiny"]) == "stt"
    assert get_model_category(None, ["kokoro", "82m"]) == "tts"
    assert get_model_category(None, ["sortformer"]) == "vad"
    assert get_model_category("spark", None) == "tts"
    assert get_model_category(None, ["not_a_model"]) is None


def test_reference_helper_aliases():
    """Public helpers the reference exposes (tts/stt/vad load(),
    get_model_and_args, utils.load_weights, is_valid_module_name)."""
    from mlx_audio_tpu.stt.utils import load as stt_load
    from mlx_audio_tpu.tts.utils import (
        fetch_from_hub,
        get_model_and_args,
        load as tts_load,
    )
    from mlx_audio_tpu.utils import is_valid_module_name, load_weights
    from mlx_audio_tpu.vad.utils import load as vad_load

    assert callable(stt_load) and callable(tts_load) and callable(vad_load)
    assert callable(fetch_from_hub) and callable(load_weights)
    mod, mt = get_model_and_args("kokoro", ["kokoro"])
    assert mt == "kokoro" and hasattr(mod, "Model")
    assert is_valid_module_name("whisper") and not is_valid_module_name("1a")
