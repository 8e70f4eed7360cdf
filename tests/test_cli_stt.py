"""End-to-end STT CLI test: save a tiny Whisper checkpoint (config +
safetensors + tokenizer.json) → `stt.generate.main` loads it by path,
transcribes a wav file, and writes srt/txt — both batch and --stream
(contract of reference stt/generate.py:250-391)."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    import jax.tree_util as jtu

    from mlx_audio_tpu.convert import save_model
    from mlx_audio_tpu.nn.module import path_str
    from mlx_audio_tpu.stt.models.whisper.whisper import (
        Model,
        ModelDimensions,
    )

    dims = dict(
        n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=4,
        n_audio_layer=1, n_vocab=51866, n_text_ctx=448, n_text_state=32,
        n_text_head=4, n_text_layer=1, model_type="whisper",
    )
    model = Model(ModelDimensions.from_dict(dims))
    leaves, _ = jtu.tree_flatten_with_path(model)
    weights = {path_str(p): np.asarray(v) for p, v in leaves}
    ckpt = tmp_path_factory.mktemp("tiny_whisper_ckpt")
    save_model(ckpt, weights, dims)

    # minimal real tokenizer.json with the whisper special-token layout
    tokenizers = pytest.importorskip("tokenizers")
    vocab = {bytes([i]).decode("latin-1"): i for i in range(256)}
    tok = tokenizers.Tokenizer(
        tokenizers.models.BPE(vocab=vocab, merges=[])
    )
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(
        add_prefix_space=False
    )
    tok.decoder = tokenizers.decoders.ByteLevel()
    specials = ["<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|es|>",
                "<|transcribe|>", "<|translate|>", "<|startoflm|>",
                "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]
    specials += [f"<|{i * 0.02:.2f}|>" for i in range(1501)]
    tok.add_special_tokens(specials)
    tok.save(str(ckpt / "tokenizer.json"))
    return ckpt


@pytest.fixture(scope="module")
def tone_wav(tmp_path_factory):
    from mlx_audio_tpu import audio_io

    sr = 16000
    t = np.arange(sr) / sr
    path = tmp_path_factory.mktemp("audio") / "tone.wav"
    audio_io.write(path, (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    return str(path)


def test_cli_batch_writes_srt(whisper_ckpt, tone_wav, tmp_path):
    from mlx_audio_tpu.stt.generate import main

    out = tmp_path / "out"
    main(["--model", str(whisper_ckpt), "--audio", tone_wav,
          "--output-path", str(out), "--format", "srt",
          "--temperature", "0.0",
          "--gen-kwargs", json.dumps({"sample_len": 8})])
    written = list(out.glob("*.srt")) if out.is_dir() else [out.with_suffix(".srt")]
    assert any(p.exists() for p in written), list(out.parent.rglob("*"))


def test_cli_stream_writes_txt(whisper_ckpt, tone_wav, tmp_path):
    from mlx_audio_tpu.stt.generate import main

    out = tmp_path / "out_stream"
    main(["--model", str(whisper_ckpt), "--audio", tone_wav,
          "--output-path", str(out), "--format", "txt", "--stream",
          "--gen-kwargs", json.dumps({"max_tokens": 8})])
    written = list(out.glob("*.txt")) if out.is_dir() else [out.with_suffix(".txt")]
    assert any(p.exists() for p in written), list(out.parent.rglob("*"))


def test_cli_all_formats(whisper_ckpt, tone_wav, tmp_path):
    from mlx_audio_tpu.stt.generate import main

    out = tmp_path / "out_all"
    main(["--model", str(whisper_ckpt), "--audio", tone_wav,
          "--output-path", str(out), "--format", "all",
          "--gen-kwargs", json.dumps({"sample_len": 6})])
    exts = {p.suffix for p in out.rglob("*") if p.is_file()}
    assert {".txt", ".srt", ".vtt", ".tsv", ".json"} <= exts, exts


def test_cli_chunked_conditioned(whisper_ckpt, tone_wav, tmp_path):
    """--chunked routes to generate_chunked; with
    --condition-on-previous-text it runs the parallel-fixpoint
    conditioning and still writes output files."""
    from mlx_audio_tpu.stt.generate import main

    out = tmp_path / "out_chunked"
    main(["--model", str(whisper_ckpt), "--audio", tone_wav,
          "--output-path", str(out), "--format", "txt",
          "--chunked", "--condition-on-previous-text",
          "--temperature", "0.0",
          "--gen-kwargs", json.dumps({"sample_len": 8})])
    written = (list(out.glob("*.txt")) if out.is_dir()
               else [out.with_suffix(".txt")])
    assert any(p.exists() for p in written), list(out.parent.rglob("*"))
