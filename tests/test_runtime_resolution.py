"""Lazy runtime wiring: tokenizers resolve from the checkpoint dir.

Covers the load-path contract that the reference establishes in per-model
post_load_hooks (reference qwen3_asr.py:789-817, glmasr.py:516-521,
vibevoice_asr.py:399-407, voxtral_realtime.py:517-522): after
``load_model(path)``, ``generate()`` must work without a manual
``set_runtime(tokenizer=...)`` call.
"""

import base64
import json
from dataclasses import dataclass, field
from typing import Optional

import pytest


def _write_tiny_hf_tokenizer(d):
    tokenizers = pytest.importorskip("tokenizers")
    vocab = {bytes([i]).decode("latin-1"): i for i in range(256)}
    tok = tokenizers.Tokenizer(tokenizers.models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(
        add_prefix_space=False)
    tok.decoder = tokenizers.decoders.ByteLevel()
    tok.save(str(d / "tokenizer.json"))
    # real checkpoints ship this; AutoTokenizer needs a tokenizer_class
    # hint (or a known model_type) to resolve a bare dir
    (d / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "PreTrainedTokenizerFast"}))


@dataclass
class _Cfg:
    model_path: Optional[str] = None


class _DummyModel:
    def __init__(self, model_path=None):
        self.config = _Cfg(model_path=model_path)


def test_resolver_lazy_loads_and_caches(tmp_path):
    from mlx_audio_tpu.utils import resolve_runtime_tokenizer

    _write_tiny_hf_tokenizer(tmp_path)
    model = _DummyModel(str(tmp_path))
    rt = {}
    tok = resolve_runtime_tokenizer(model, rt, "Test")
    assert tok is not None
    ids = tok.encode("hello")
    assert tok.decode(ids).strip() == "hello"
    # cached: second call returns the same object without reloading
    assert resolve_runtime_tokenizer(model, rt, "Test") is tok


def test_resolver_explicit_runtime_wins(tmp_path):
    from mlx_audio_tpu.utils import resolve_runtime_tokenizer

    sentinel = object()
    assert resolve_runtime_tokenizer(
        _DummyModel(), {"tokenizer": sentinel}, "Test") is sentinel


def test_resolver_clear_error_without_path():
    from mlx_audio_tpu.utils import resolve_runtime_tokenizer

    with pytest.raises(RuntimeError, match="set_runtime"):
        resolve_runtime_tokenizer(_DummyModel(), {}, "Test")


def test_resolver_clear_error_on_bad_dir(tmp_path):
    from mlx_audio_tpu.utils import resolve_runtime_tokenizer

    with pytest.raises(RuntimeError, match="could not be loaded"):
        resolve_runtime_tokenizer(_DummyModel(str(tmp_path)), {}, "Test")


def test_base_load_model_records_model_path(tmp_path):
    """Any model loaded by path can later resolve siblings from its dir."""
    import jax.tree_util as jtu
    import numpy as np

    from mlx_audio_tpu.convert import save_model
    from mlx_audio_tpu.nn.module import path_str
    from mlx_audio_tpu.stt.models.whisper.whisper import (Model,
                                                          ModelDimensions)
    from mlx_audio_tpu.stt.utils import load_model

    dims = dict(
        n_mels=80, n_audio_ctx=100, n_audio_state=32, n_audio_head=4,
        n_audio_layer=1, n_vocab=51866, n_text_ctx=448, n_text_state=32,
        n_text_head=4, n_text_layer=1, model_type="whisper",
    )
    model = Model(ModelDimensions.from_dict(dims))

    leaves, _ = jtu.tree_flatten_with_path(model)
    weights = {path_str(p): np.asarray(v) for p, v in leaves}
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_model(ckpt, weights, dims)
    loaded = load_model(str(ckpt))
    cfg = (getattr(loaded, "config", None) or getattr(loaded, "args", None)
           or getattr(loaded, "dims", None))
    assert getattr(cfg, "model_path", None) == str(ckpt)


def test_tekken_tokenizer_roundtrip(tmp_path):
    from mlx_audio_tpu.stt.models.voxtral_realtime.tokenizer import (
        TekkenTokenizer)

    words = [b"hello", b" world", b"!"]
    data = {
        "config": {"default_num_special_tokens": 3},
        "special_tokens": [{"rank": 0, "token_str": "<s>"},
                           {"rank": 1, "token_str": "</s>"}],
        "vocab": [{"token_bytes": base64.b64encode(w).decode()}
                  for w in words],
    }
    (tmp_path / "tekken.json").write_text(json.dumps(data))
    tok = TekkenTokenizer.from_model_path(tmp_path)
    # ids 3,4,5 map to the vocab entries; 0-2 are specials (skipped)
    assert tok.decode([0, 3, 4, 1, 5]) == "hello world!"
    assert tok.token_bytes(2) == b""
    assert tok.token_bytes(999) == b""


def test_tekken_missing_file_raises(tmp_path):
    from mlx_audio_tpu.stt.models.voxtral_realtime.tokenizer import (
        TekkenTokenizer)

    with pytest.raises(FileNotFoundError):
        TekkenTokenizer.from_model_path(tmp_path)


def test_cosyvoice2_campplus_weight_extraction(tmp_path):
    """campplus.* keys in the consolidated checkpoint are found, else a
    separate campplus.safetensors (reference cosyvoice2.py:991-1028)."""
    import numpy as np
    from safetensors.numpy import save_file

    from mlx_audio_tpu.tts.models.cosyvoice2.cosyvoice2 import Model

    save_file({"campplus.xvector.tdnn.linear.weight":
               np.zeros((4, 4), np.float32),
               "flow.something": np.zeros((2,), np.float32)},
              str(tmp_path / "model.safetensors"))
    w = Model._campplus_weights(tmp_path)
    assert set(w) == {"xvector.tdnn.linear.weight"}

    sep = tmp_path / "sep"
    sep.mkdir()
    save_file({"xvector.tdnn.linear.weight": np.ones((4, 4), np.float32)},
              str(sep / "campplus.safetensors"))
    w = Model._campplus_weights(sep)
    assert "xvector.tdnn.linear.weight" in w


def test_cosyvoice3_special_token_inventory():
    from mlx_audio_tpu.tts.models.cosyvoice3.special_tokens import (
        COSYVOICE3_ADDITIONAL_SPECIAL_TOKENS,
        COSYVOICE3_TOKENIZER_SPECIAL_TOKENS)

    toks = COSYVOICE3_ADDITIONAL_SPECIAL_TOKENS
    assert len(toks) == 280 and len(set(toks)) == 280
    for t in ("<|endofprompt|>", "[breath]", "[AA1]", "[laughter]"):
        assert t in toks
    assert COSYVOICE3_TOKENIZER_SPECIAL_TOKENS["eos_token"] == "<|endoftext|>"
