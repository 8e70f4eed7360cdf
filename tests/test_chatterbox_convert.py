"""Chatterbox original-release → combined native checkpoint converter."""

import json

import numpy as np
import pytest
from safetensors.numpy import load_file, save_file



@pytest.fixture(scope="module")
def source_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chatterbox_src")
    rng = np.random.default_rng(0)
    save_file({
        "lstm.weight_ih_l0": rng.standard_normal((64, 40)).astype(np.float32),
        "proj.weight": rng.standard_normal((16, 16)).astype(np.float32),
        "similarity_weight": np.ones((1,), np.float32),  # training-only
    }, str(d / "ve.safetensors"))
    save_file({
        "tfmr.model.layers.0.mlp.up_proj.weight":
            rng.standard_normal((8, 4)).astype(np.float32),
        "tfmr.embed_tokens.weight":  # unused: custom input embeddings
            rng.standard_normal((10, 4)).astype(np.float32),
        "speech_head.weight": rng.standard_normal((70, 4)).astype(np.float32),
    }, str(d / "t3_cfg.safetensors"))
    save_file({
        "flow.encoder_proj.weight":
            rng.standard_normal((6, 6)).astype(np.float32),
        "tokenizer.quantizer.codebook":  # S3Tokenizer ships separately
            rng.standard_normal((4, 4)).astype(np.float32),
    }, str(d / "s3gen.safetensors"))
    (d / "tokenizer.json").write_text("{}")
    return d


def test_convert_combines_components(source_dir, tmp_path):
    from mlx_audio_tpu.tts.models.chatterbox.convert import convert

    tiny_t3 = dict(
        text_tokens_dict_size=50, speech_tokens_dict_size=70,
        start_speech_token=60, stop_speech_token=61,
        max_speech_tokens=64, speaker_embed_size=16,
        llama_overrides=dict(hidden_size=16, intermediate_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             num_key_value_heads=2),
    )
    out = convert(str(source_dir), str(tmp_path / "converted"),
                  model_config={"t3_config": tiny_t3})
    w = load_file(str(out / "model.safetensors"))
    assert "ve.lstm.0.Wx" in w                       # torch LSTM remap
    assert "ve.proj.weight" in w
    assert "ve.similarity_weight" not in w           # training-only dropped
    assert "t3.tfmr.layers.0.mlp.up_proj.weight" in w  # tfmr.model. stripped
    assert "t3.speech_head.weight" in w
    assert not any("embed_tokens" in k for k in w)   # unused table dropped
    assert "s3gen.flow.encoder_proj.weight" in w
    assert not any(k.startswith("s3gen.tokenizer") for k in w)
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["model_type"] == "chatterbox"
    assert (out / "tokenizer.json").exists()
