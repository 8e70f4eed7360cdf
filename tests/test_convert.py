"""Conversion CLI tests: quantize → load → dequantize round trip."""

import json

import numpy as np
import pytest
from safetensors.numpy import load_file, save_file

from mlx_audio_tpu import convert as cv


@pytest.fixture()
def src_model(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    rng = np.random.default_rng(0)
    weights = {
        "layers.0.proj.weight": rng.standard_normal((128, 64)).astype(np.float32),
        "layers.0.norm.weight": np.ones(128, np.float32),
        "conv.weight": rng.standard_normal((16, 3, 8)).astype(np.float32),
    }
    save_file(weights, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({"model_type": "kokoro"}))
    return d


def test_quantize_roundtrip(src_model, tmp_path):
    out = cv.convert(str(src_model), str(tmp_path / "q4"), quantize=True,
                     q_bits=4, q_group_size=32)
    w = load_file(str(out / "model.safetensors"))
    assert w["layers.0.proj.weight"].dtype == np.uint32
    assert "layers.0.proj.scales" in w
    # norm and conv untouched
    assert w["layers.0.norm.weight"].dtype == np.float32
    assert w["conv.weight"].shape == (16, 3, 8)
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["quantization"] == {"bits": 4, "group_size": 32}
    assert (out / "README.md").exists()

    # dequantize back and compare to original within quant error
    out2 = cv.convert(str(out), str(tmp_path / "deq"), dequantize=True)
    w2 = load_file(str(out2 / "model.safetensors"))
    orig = load_file(str(src_model / "model.safetensors"))
    err = np.abs(w2["layers.0.proj.weight"] - orig["layers.0.proj.weight"]).max()
    assert err < 0.2  # half a 4-bit step of typical scale
    assert "layers.0.proj.scales" not in w2


def test_domain_detection():
    from pathlib import Path

    assert cv.detect_model_domain(Path("x"), {"model_type": "kokoro"}) == "tts"
    assert cv.detect_model_domain(Path("x"), {"model_type": "whisper"}) == "stt"
    assert cv.detect_model_domain(Path("x"), {"model_type": "sortformer"}) == "vad"
    assert cv.detect_model_domain(Path("some/snac_24khz"), {}) == "codec"
    assert cv.detect_model_domain(
        Path("y"), {"n_audio_ctx": 1500, "n_text_ctx": 448}
    ) == "stt"


def test_mixed_recipe(src_model, tmp_path):
    # add an embed layer so mixed_3_6 actually mixes bit-widths
    w = load_file(str(src_model / "model.safetensors"))
    rng = np.random.default_rng(1)
    w["embed_tokens.weight"] = rng.standard_normal((96, 64)).astype(np.float32)
    save_file(w, str(src_model / "model.safetensors"))

    out = cv.convert(str(src_model), str(tmp_path / "mixed"), quantize=True,
                     q_bits=3, q_group_size=32, q_recipe="mixed_3_6")
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["quantization"]["recipe"] == "mixed_3_6"
    # embed differs from the 3-bit default → per-path override for the loader
    assert cfg["quantization"]["embed_tokens"] == {"bits": 6, "group_size": 32}
    assert "layers.0.proj" not in cfg["quantization"]  # default bits, no entry
    qw = load_file(str(out / "model.safetensors"))
    # 3/6-bit use MLX's uint8 bitstream packing, not uint32 words
    assert qw["layers.0.proj.weight"].dtype == np.uint8
    assert qw["embed_tokens.weight"].dtype == np.uint8

    # mixed dequantize restores both bit-widths within their quant error
    out2 = cv.convert(str(out), str(tmp_path / "mixed_deq"), dequantize=True)
    w2 = load_file(str(out2 / "model.safetensors"))
    err3 = np.abs(w2["layers.0.proj.weight"] - w["layers.0.proj.weight"]).max()
    err6 = np.abs(w2["embed_tokens.weight"] - w["embed_tokens.weight"]).max()
    assert err3 < 0.5, err3  # 3-bit step
    assert err6 < 0.1, err6  # 6-bit step
