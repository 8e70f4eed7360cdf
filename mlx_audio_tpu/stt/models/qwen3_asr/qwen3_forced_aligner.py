"""Qwen3 Forced Aligner: word-level timestamps via timestamp-class logits.

TPU-native re-implementation of the reference
mlx_audio/stt/models/qwen3_asr/qwen3_forced_aligner.py:15-774. The model is
a single (non-autoregressive) jitted forward — audio embeddings spliced
into the text prompt, a classification head over `classify_num` timestamp
bins — so alignment costs one dispatch. Text tokenization/LIS timestamp
repair run on the host.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ..whisper import audio as A
from .qwen3_asr import AudioEncoder, AudioEncoderConfig, TextConfig

__all__ = ["ForcedAlignerModel", "ForcedAlignerConfig", "ForcedAlignResult",
           "ForcedAlignItem", "ForceAlignProcessor"]


class ForceAlignProcessor:
    """Host-side text chunking + timestamp repair (reference
    qwen3_forced_aligner.py:15-297)."""

    def is_cjk_char(self, ch: str) -> bool:
        code = ord(ch)
        return (0x4E00 <= code <= 0x9FFF or 0x3400 <= code <= 0x4DBF
                or 0xF900 <= code <= 0xFAFF)

    def tokenize_space_lang(self, text: str) -> List[str]:
        return [w for w in text.split() if w]

    def tokenize_chinese_mixed(self, text: str) -> List[str]:
        tokens: List[str] = []
        buf = ""
        for ch in text:
            if self.is_cjk_char(ch):
                if buf.strip():
                    tokens.extend(buf.split())
                buf = ""
                tokens.append(ch)
            elif ch.isspace():
                if buf.strip():
                    tokens.extend(buf.split())
                buf = ""
            else:
                buf += ch
        if buf.strip():
            tokens.extend(buf.split())
        return tokens

    def tokenize_japanese(self, text: str) -> List[str]:
        return [ch for ch in text if not ch.isspace()]

    def tokenize_korean(self, text: str) -> List[str]:
        return self.tokenize_space_lang(text)

    def fix_timestamp(self, data) -> List[int]:
        """Repair non-monotonic predictions via LIS + local interpolation
        (reference qwen3_forced_aligner.py:147-244)."""
        data = list(np.asarray(data).tolist())
        n = len(data)
        if n == 0:
            return []
        dp = [1] * n
        parent = [-1] * n
        for i in range(1, n):
            for j in range(i):
                if data[j] <= data[i] and dp[j] + 1 > dp[i]:
                    dp[i] = dp[j] + 1
                    parent[i] = j
        idx = dp.index(max(dp))
        is_normal = [False] * n
        while idx != -1:
            is_normal[idx] = True
            idx = parent[idx]
        result = data.copy()
        i = 0
        while i < n:
            if is_normal[i]:
                i += 1
                continue
            j = i
            while j < n and not is_normal[j]:
                j += 1
            left = next((result[k] for k in range(i - 1, -1, -1)
                         if is_normal[k]), None)
            right = next((result[k] for k in range(j, n)
                          if is_normal[k]), None)
            count = j - i
            if count <= 2:
                for k in range(i, j):
                    if left is None:
                        result[k] = right
                    elif right is None:
                        result[k] = left
                    else:
                        result[k] = left if (k - (i - 1)) <= (j - k) else right
            else:
                if left is not None and right is not None:
                    step = (right - left) / (count + 1)
                    for k in range(i, j):
                        result[k] = left + step * (k - i + 1)
                else:
                    fill = left if left is not None else right
                    for k in range(i, j):
                        result[k] = fill
            i = j
        return [int(r) for r in result]

    def encode_timestamp(self, text: str, language: str
                         ) -> Tuple[List[str], str]:
        language = language.lower()
        if language == "japanese":
            words = self.tokenize_japanese(text)
        elif language == "korean":
            words = self.tokenize_korean(text)
        elif language == "chinese":
            words = self.tokenize_chinese_mixed(text)
        else:
            words = self.tokenize_space_lang(text)
        inp = "<timestamp><timestamp>".join(words) + "<timestamp><timestamp>"
        inp = "<|audio_start|><|audio_pad|><|audio_end|>" + inp
        return words, inp

    def parse_timestamp(self, word_list: List[str],
                        timestamp) -> List[Dict[str, Any]]:
        fixed = self.fix_timestamp(timestamp)
        return [{"text": w, "start_time": fixed[2 * i],
                 "end_time": fixed[2 * i + 1]}
                for i, w in enumerate(word_list)]


@dataclass(frozen=True)
class ForcedAlignItem:
    text: str
    start_time: float
    end_time: float


@dataclass(frozen=True)
class ForcedAlignResult:
    items: List[ForcedAlignItem]

    @property
    def text(self) -> str:
        return " ".join(it.text for it in self.items)

    @property
    def segments(self) -> List[Dict[str, Any]]:
        return [{"text": it.text, "start": it.start_time,
                 "end": it.end_time} for it in self.items]

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@dataclass
class ForcedAlignerConfig:
    audio_config: Any = None
    text_config: Any = None
    model_type: str = "qwen3_forced_aligner"
    audio_token_id: int = 151676
    timestamp_token_id: int = 151705
    timestamp_segment_time: float = 80.0
    classify_num: int = 5000
    support_languages: List[str] = field(default_factory=list)

    def __post_init__(self):
        if self.audio_config is None:
            self.audio_config = AudioEncoderConfig()
        elif isinstance(self.audio_config, dict):
            self.audio_config = AudioEncoderConfig.from_dict(self.audio_config)
        if self.text_config is None:
            self.text_config = TextConfig()
        elif isinstance(self.text_config, dict):
            self.text_config = TextConfig.from_dict(self.text_config)

    @classmethod
    def from_dict(cls, d: dict) -> "ForcedAlignerConfig":
        d = dict(d)
        if "thinker_config" in d:
            thinker = d.pop("thinker_config")
            for k in ("audio_config", "text_config", "audio_token_id",
                      "timestamp_token_id", "timestamp_segment_time",
                      "classify_num"):
                if k in thinker:
                    d[k] = thinker[k]
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@jax.jit
def _aligner_forward(model, inputs_embeds):
    h, _ = model.language_model.model(inputs_embeds)
    return model.lm_head(h)


class ForcedAlignerModel(Module):
    """reference qwen3_forced_aligner.py:449-774."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ForcedAlignerConfig.from_dict(config)
        self.config = config or ForcedAlignerConfig()
        self.audio_tower = AudioEncoder(self.config.audio_config)
        tc = self.config.text_config
        lm_cfg = LMConfig(
            model_type="qwen3", vocab_size=tc.vocab_size,
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_hidden_layers=tc.num_hidden_layers,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            head_dim=tc.head_dim, rms_norm_eps=tc.rms_norm_eps,
            rope_theta=tc.rope_theta, tie_word_embeddings=True)
        self.language_model = CausalLM(lm_cfg)
        self.lm_head = nn.Linear(tc.hidden_size, self.config.classify_num,
                                 bias=False)
        self.aligner_processor = ForceAlignProcessor()

    @property
    def sample_rate(self) -> int:
        return 16000

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            ForcedAlignerModel._RUNTIME.setdefault(id(self), {})[
                "tokenizer"] = tokenizer

    def generate(self, audio, text: Union[str, List[str]],
                 language: Union[str, List[str]] = "English",
                 tokenizer=None, **kwargs):
        if tokenizer is None:
            from ....utils import resolve_runtime_tokenizer

            tokenizer = resolve_runtime_tokenizer(
                self, ForcedAlignerModel._RUNTIME.setdefault(id(self), {}),
                "Forced-aligner")

        single = not isinstance(audio, list)
        audios = [audio] if single else audio
        texts = [text] if isinstance(text, str) else text
        langs = [language] if isinstance(language, str) else language
        if len(langs) == 1:
            langs = langs * len(audios)

        results = []
        for wav, txt, lang in zip(audios, texts, langs):
            wav = np.asarray(wav, np.float32).reshape(-1)
            mel = np.asarray(A.log_mel_spectrogram(
                jnp.asarray(wav),
                n_mels=self.config.audio_config.num_mel_bins)).T[None]
            audio_emb = self.audio_tower(jnp.asarray(mel))
            n_audio = audio_emb.shape[0]

            words, inp = self.aligner_processor.encode_timestamp(txt, lang)
            inp = inp.replace("<|audio_pad|>", "<|audio_pad|>" * n_audio)
            ids = np.asarray(tokenizer.encode(inp), np.int64).reshape(-1)

            emb = np.array(jax.device_get(
                self.language_model.model.embed_tokens(
                    jnp.asarray(ids[None], jnp.int32))))
            mask = ids == self.config.audio_token_id
            n = min(int(mask.sum()), n_audio)
            if n:
                emb[0][np.nonzero(mask)[0][:n]] = np.asarray(
                    jax.device_get(audio_emb))[:n]

            logits = _aligner_forward(self, jnp.asarray(emb))
            out_ids = np.asarray(jnp.argmax(logits[0], axis=-1))

            ts_mask = ids == self.config.timestamp_token_id
            ts_ms = out_ids[ts_mask] * self.config.timestamp_segment_time
            parsed = self.aligner_processor.parse_timestamp(words, ts_ms)
            items = [ForcedAlignItem(str(p["text"]),
                                     round(p["start_time"] / 1000.0, 3),
                                     round(p["end_time"] / 1000.0, 3))
                     for p in parsed]
            results.append(ForcedAlignResult(items=items))
        return results[0] if single else results

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("thinker."):
                k = k[len("thinker."):]
            if k.startswith("model."):
                k = "language_model." + k
            k = k.replace(".self_attn.q_proj.", ".self_attn_q.")
            k = k.replace(".self_attn.k_proj.", ".self_attn_k.")
            k = k.replace(".self_attn.v_proj.", ".self_attn_v.")
            k = k.replace(".self_attn.out_proj.", ".self_attn_o.")
            out[k] = value
        return orient_weights_to_model(self, out)
