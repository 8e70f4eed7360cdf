"""CosyVoice3 TTS: Qwen2 speech-token LM → DiT flow matching → causal HiFT.

TPU-native re-implementation of the reference
mlx_audio/tts/models/cosyvoice3/cosyvoice3.py:25-1569. All three stages run
as jitted graphs: the LM decodes on device in one dispatch, the flow's
cosine-scheduled CFG Euler solve is one program per token-length bucket, and
the causal HiFT mel→wav pass is one program per mel bucket.

Modes (reference cosyvoice3.py:295-772): zero-shot (ref audio + transcript,
prefixed with the system prompt), cross-lingual (ref audio only — the text
itself is prefixed), instruct (style text), and voice conversion.
"""

from __future__ import annotations

import math
import re
import time
import unicodedata
from functools import partial
from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.s3gen import CAMPPlus
from ....codec.models.s3gen.mel import mel_spectrogram
from ....nn.module import Module
from .config import CosyVoice3Config, ModelConfig
from .flow import CausalMaskedDiffWithDiT, build_flow_model
from .hifigan import CausalHiFTGenerator
from .llm import CosyVoice3LM

__all__ = ["CosyVoice3", "Model", "build_cosyvoice3"]

TOKEN_BUCKET = 50  # flow token-length granularity (2 s at 25 Hz)

# reference cosyvoice3.py:35-42
SILENT_TOKENS = {1, 2, 28, 29, 55, 248, 494, 2241, 2242, 2322, 2323}
MAX_PROMPT_AUDIO_SECONDS = 30
SYSTEM_PROMPT = "You are a helpful assistant."
END_OF_PROMPT = "<|endofprompt|>"
ZERO_SHOT_PROMPT_PREFIX = f"{SYSTEM_PROMPT}{END_OF_PROMPT}"
INSTRUCT_PROMPT_PREFIX = f"{SYSTEM_PROMPT} "


# ----------------------------------------------------------------------
# text frontend (reference cosyvoice3.py:45-130, 1101-1191)
def _contains_chinese(text: str) -> bool:
    return any("一" <= c <= "鿿" for c in text)


def _is_only_punctuation(text: str) -> bool:
    t = text.strip()
    if not t:
        return True
    return all(unicodedata.category(c)[0] in {"P", "S"} for c in t)


def _replace_blank(text: str) -> str:
    out = []
    for i, c in enumerate(text):
        if c != " ":
            out.append(c)
            continue
        if i == 0 or i == len(text) - 1:
            continue
        p, n = text[i - 1], text[i + 1]
        if p.isascii() and p != " " and n.isascii() and n != " ":
            out.append(c)
    return "".join(out)


def _replace_corner_mark(text: str) -> str:
    return text.replace("²", "平方").replace("³", "立方")


def _remove_bracket(text: str) -> str:
    return (text.replace("（", "").replace("）", "").replace("【", "")
            .replace("】", "").replace("`", "").replace("——", " "))


_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10**9, "billion"), (10**6, "million"), (10**3, "thousand"),
          (100, "hundred")]


def _num_to_words(n: int) -> str:
    """Small English number speller (stand-in for num2words,
    reference cosyvoice3.py:110-130)."""
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + (f"-{_ONES[r]}" if r else "")
    for base, name in _SCALE:
        if n >= base:
            q, r = divmod(n, base)
            head = f"{_num_to_words(q)} {name}"
            return head + (f" {_num_to_words(r)}" if r else "")
    return str(n)


def _spell_out_number(text: str) -> str:
    return re.sub(r"\d+", lambda m: _num_to_words(int(m.group())), text)


def normalize_text(text: str) -> str:
    """Lightweight normalization (reference cosyvoice3.py:1101-1127)."""
    t = text.strip()
    if not t:
        return t
    if "<|" in t and "|>" in t:
        return t
    if _contains_chinese(t):
        t = t.replace("\n", "")
        t = _replace_blank(t)
        t = _replace_corner_mark(t)
        t = t.replace(".", "。").replace(" - ", "，")
        t = _remove_bracket(t)
        return re.sub(r"[，,、]+$", "。", t)
    return _spell_out_number(t)


def split_text(text: str, tokenize=None) -> List[str]:
    """Sentence-group splitting (reference cosyvoice3.py:1128-1191)."""
    t = normalize_text(text)
    if not t:
        return []
    if "<|" in t and "|>" in t:
        return [t]
    is_zh = _contains_chinese(t)
    punc = ({"。", "？", "！", "；", "：", "、", ".", "?", "!", ";"}
            if is_zh else {".", "?", "!", ";", ":"})
    if t[-1] not in punc:
        t += "。" if is_zh else "."
    utts, start = [], 0
    for i, c in enumerate(t):
        if c not in punc:
            continue
        end = i + 1
        if end < len(t) and t[end] in {'"', "”"}:
            end += 1
        if t[start:end].strip():
            utts.append(t[start:end])
        start = end

    def length(v: str) -> int:
        if not v:
            return 0
        if is_zh or tokenize is None:
            return len(v)
        return len(tokenize(v))

    chunks: List[str] = []
    cur = ""
    for u in utts:
        if length(cur + u) > 80 and length(cur) > 60:
            if not _is_only_punctuation(cur):
                chunks.append(cur)
            cur = ""
        cur += u
    if cur:
        if length(cur) < 20 and chunks:
            chunks[-1] += cur
        elif not _is_only_punctuation(cur):
            chunks.append(cur)
    return chunks or [t]


# ----------------------------------------------------------------------
def _pad_tokens(tokens: np.ndarray, bucket: int = TOKEN_BUCKET) -> np.ndarray:
    n = tokens.shape[1]
    target = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    return np.pad(tokens, ((0, 0), (0, target - n)))


@partial(jax.jit, static_argnames=("n_timesteps", "streaming"))
def _flow_infer(flow, token, token_len, prompt_token, prompt_token_len,
                prompt_feat, embedding, key, n_timesteps: int,
                streaming: bool = False):
    feat, _ = flow.inference(
        token=token, token_len=token_len, prompt_token=prompt_token,
        prompt_token_len=prompt_token_len, prompt_feat=prompt_feat,
        embedding=embedding, key=key, n_timesteps=n_timesteps,
        streaming=streaming)
    return feat


@jax.jit
def _hift_infer(hifigan, mel, key):
    wav, _ = hifigan(mel, key=key)
    return wav


def build_cosyvoice3(config: CosyVoice3Config) -> "CosyVoice3":
    """Construct all three stages (reference cosyvoice3.py:774-967)."""
    f = config.flow
    d = f.dit
    flow = build_flow_model(
        input_size=f.input_size, output_size=f.output_size,
        spk_embed_dim=f.spk_embed_dim, vocab_size=f.vocab_size,
        input_frame_rate=f.input_frame_rate,
        token_mel_ratio=f.token_mel_ratio,
        pre_lookahead_len=f.pre_lookahead_len,
        dit_dim=d.dim, dit_depth=d.depth, dit_heads=d.heads,
        dit_dim_head=d.dim_head, dit_ff_mult=d.ff_mult,
        cfm_sigma_min=f.cfm_sigma_min, cfm_t_scheduler=f.cfm_t_scheduler,
        cfm_inference_cfg_rate=f.cfm_inference_cfg_rate,
        n_timesteps=f.n_timesteps, static_chunk_size=d.static_chunk_size)

    h = config.hifigan
    hifigan = CausalHiFTGenerator(
        in_channels=h.in_channels, base_channels=h.base_channels,
        nb_harmonics=h.nb_harmonics, sampling_rate=h.sampling_rate,
        nsf_alpha=h.nsf_alpha, nsf_sigma=h.nsf_sigma,
        nsf_voiced_threshold=h.nsf_voiced_threshold,
        upsample_rates=list(h.upsample_rates),
        upsample_kernel_sizes=list(h.upsample_kernel_sizes),
        istft_params={"n_fft": h.istft_n_fft, "hop_len": h.istft_hop_len},
        resblock_kernel_sizes=list(h.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(x) for x in
                                 h.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(h.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[
            list(x) for x in h.source_resblock_dilation_sizes],
        conv_pre_look_right=h.conv_pre_look_right)

    return CosyVoice3(config, CosyVoice3LM(config.llm), flow, hifigan)


class CosyVoice3(Module):
    """Composite model (reference cosyvoice3.py:132-772)."""

    def __init__(self, config: Optional[CosyVoice3Config] = None,
                 llm: Optional[CosyVoice3LM] = None,
                 flow: Optional[CausalMaskedDiffWithDiT] = None,
                 hifigan: Optional[CausalHiFTGenerator] = None):
        self.config = config or CosyVoice3Config()
        self.llm = llm
        self.flow = flow
        self.hifigan = hifigan

    @property
    def sample_rate(self) -> int:
        return self.config.hifigan.sampling_rate

    # ------------------------------------------------------------------
    def generate_tokens(self, text, prompt_text=None,
                        prompt_speech_token=None, sampling: int = 25,
                        max_token_text_ratio: float = 20.0,
                        min_token_text_ratio: float = 2.0,
                        key=None) -> np.ndarray:
        # Under a running server an RASBatcher may be installed:
        # concurrent requests' speech-token decodes then run in lock-step.
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            embeds = self.llm.build_prompt_embeds(
                np.asarray(text), prompt_text, prompt_speech_token)
            n_text = int(np.asarray(text).size)
            seed = (int(np.asarray(key).reshape(-1)[-1]) if key is not None
                    else int(np.random.randint(0, 2**31 - 1)))
            return np.asarray(hook.submit(
                np.asarray(embeds, np.float32),
                min_tokens=int(n_text * min_token_text_ratio),
                max_steps=max(1, int(n_text * max_token_text_ratio)),
                seed=seed).result(), np.int32)
        tokens, _ = self.llm.inference(
            text=text, prompt_text=prompt_text,
            prompt_speech_token=prompt_speech_token, sampling=sampling,
            max_token_text_ratio=max_token_text_ratio,
            min_token_text_ratio=min_token_text_ratio, key=key)
        return tokens

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent requests' RAS speech-token decodes
        run in lock-step (CosyVoice3 stop rule: any token >= V); flow +
        HiFT vocoding stay per-request."""
        from ..cosyvoice2.batcher import RASBatcher

        return RASBatcher(self, lm=self.llm, v3=True, **kwargs)

    def tokens_to_mel(self, tokens: np.ndarray, prompt_token: np.ndarray,
                      prompt_feat, embedding,
                      n_timesteps: Optional[int] = None, key=None,
                      streaming: bool = False) -> jnp.ndarray:
        """tokens (1, T) → mel (1, T·2, 80) past the prompt."""
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        prompt_token = np.asarray(prompt_token, np.int32).reshape(1, -1)
        n_new = tokens.shape[1]
        padded = _pad_tokens(tokens)
        if key is None:
            key = jax.random.PRNGKey(42)
        feat = _flow_infer(
            self.flow, jnp.asarray(padded), jnp.array([n_new], jnp.int32),
            jnp.asarray(prompt_token),
            jnp.array([prompt_token.shape[1]], jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(embedding), key,
            n_timesteps or self.flow.n_timesteps, streaming)
        return feat[:, : n_new * self.flow.token_mel_ratio]

    def mel_to_audio(self, mel, key=None) -> np.ndarray:
        if key is None:
            key = jax.random.PRNGKey(0)
        return np.asarray(_hift_infer(self.hifigan, jnp.asarray(mel), key))

    # ------------------------------------------------------------------
    def synthesize(self, text, prompt_text, prompt_speech_token, prompt_mel,
                   speaker_embedding, sampling: int = 25,
                   n_timesteps: int = 10,
                   max_token_text_ratio: float = 20.0,
                   min_token_text_ratio: float = 2.0, key=None
                   ) -> np.ndarray:
        """Zero-shot pipeline (reference cosyvoice3.py:295-403)."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        k1, k2, k3 = jax.random.split(key, 3)
        tokens = self.generate_tokens(
            text, prompt_text, prompt_speech_token, sampling=sampling,
            max_token_text_ratio=max_token_text_ratio,
            min_token_text_ratio=min_token_text_ratio, key=k1)
        if tokens.size == 0:
            raise RuntimeError("No tokens generated")
        mel = self.tokens_to_mel(tokens, prompt_speech_token, prompt_mel,
                                 speaker_embedding, n_timesteps, key=k2)
        return self.mel_to_audio(mel, key=k3)

    def synthesize_cross_lingual(self, text, prompt_speech_token,
                                 prompt_mel, speaker_embedding,
                                 sampling: int = 25, n_timesteps: int = 10,
                                 max_token_text_ratio: float = 20.0,
                                 min_token_text_ratio: float = 2.0,
                                 key=None) -> np.ndarray:
        """LM sees no prompt text/speech (reference cosyvoice3.py:404-475).
        The caller prefixes `text` with ZERO_SHOT_PROMPT_PREFIX."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        k1, k2, k3 = jax.random.split(key, 3)
        tokens = self.generate_tokens(
            text, None, None, sampling=sampling,
            max_token_text_ratio=max_token_text_ratio,
            min_token_text_ratio=min_token_text_ratio, key=k1)
        if tokens.size == 0:
            raise RuntimeError("No tokens generated")
        mel = self.tokens_to_mel(tokens, prompt_speech_token, prompt_mel,
                                 speaker_embedding, n_timesteps, key=k2)
        return self.mel_to_audio(mel, key=k3)

    def synthesize_instruct(self, text, instruct_text, prompt_speech_token,
                            prompt_mel, speaker_embedding,
                            sampling: int = 25, n_timesteps: int = 10,
                            max_token_text_ratio: float = 20.0,
                            min_token_text_ratio: float = 2.0,
                            key=None) -> np.ndarray:
        """Instruct text as LM prompt, no speech prompt in the LM
        (reference cosyvoice3.py:476-548)."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        k1, k2, k3 = jax.random.split(key, 3)
        tokens = self.generate_tokens(
            text, instruct_text, None, sampling=sampling,
            max_token_text_ratio=max_token_text_ratio,
            min_token_text_ratio=min_token_text_ratio, key=k1)
        if tokens.size == 0:
            raise RuntimeError("No tokens generated")
        mel = self.tokens_to_mel(tokens, prompt_speech_token, prompt_mel,
                                 speaker_embedding, n_timesteps, key=k2)
        return self.mel_to_audio(mel, key=k3)

    def synthesize_vc(self, source_speech_token, prompt_speech_token,
                      prompt_mel, speaker_embedding, n_timesteps: int = 10,
                      key=None) -> np.ndarray:
        """Voice conversion: no LM (reference cosyvoice3.py:549-595)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k2, k3 = jax.random.split(key)
        mel = self.tokens_to_mel(source_speech_token, prompt_speech_token,
                                 prompt_mel, speaker_embedding,
                                 n_timesteps, key=k2)
        return self.mel_to_audio(mel, key=k3)

    def synthesize_streaming(self, text, prompt_text, prompt_speech_token,
                             prompt_mel, speaker_embedding,
                             chunk_tokens: int = 25, **kwargs):
        """Chunked synthesis with the DiT's static chunk mask
        (reference cosyvoice3.py:596-772)."""
        key = kwargs.pop("key", None)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        k1, key = jax.random.split(key)
        tokens = self.generate_tokens(text, prompt_text,
                                      prompt_speech_token, key=k1, **kwargs)
        for start in range(0, len(tokens), chunk_tokens):
            chunk = tokens[start: start + chunk_tokens]
            if chunk.size == 0:
                break
            key, k2, k3 = jax.random.split(key, 3)
            mel = self.tokens_to_mel(
                np.concatenate([tokens[:start], chunk])[None],
                prompt_speech_token, prompt_mel, speaker_embedding,
                key=k2, streaming=True)
            mel = mel[:, start * self.flow.token_mel_ratio:]
            yield self.mel_to_audio(mel, key=k3)


class Model(Module):
    """generate()-API wrapper (reference cosyvoice3.py:968-1569).

    Runtime dependencies (Qwen2 text tokenizer, S3TokenizerV3 speech
    tokenizer, CAM++ speaker encoder) are injectable via `set_runtime`.
    """

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate
        inner = self.config.cosyvoice3 or CosyVoice3Config()
        self.model = build_cosyvoice3(inner)

    def make_batcher(self, **kwargs):
        """Serving batcher (server entry point): delegates to the inner
        CosyVoice3 engine, whose generate_tokens() checks the hook."""
        return self.model.make_batcher(**kwargs)

    def set_runtime(self, tokenizer=None, s3_tokenizer=None,
                    speaker_encoder=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if tokenizer is not None:
            rt["tokenizer"] = tokenizer
        if s3_tokenizer is not None:
            rt["s3_tokenizer"] = s3_tokenizer
        if speaker_encoder is not None:
            rt["speaker_encoder"] = speaker_encoder

    def _runtime(self, name):
        """Explicit runtime slot → lazy wiring from the checkpoint dir
        (reference cosyvoice3.py:1016-1092): HF tokenizer + CosyVoice3
        special-token inventory, S3TokenizerV3 from its published repo,
        CAM++ weights from the consolidated `campplus.*` keys."""
        rt = Model._RUNTIME.setdefault(id(self), {})
        if name in rt:
            return rt[name]
        mp = getattr(self.config, "model_path", None)
        if name == "tokenizer" and mp:
            from ....utils import load_hf_tokenizer

            from .special_tokens import COSYVOICE3_TOKENIZER_SPECIAL_TOKENS

            tok_dir = Path(mp) / "tokenizer"
            tok = load_hf_tokenizer(tok_dir if tok_dir.exists() else mp)
            tok.add_special_tokens(dict(COSYVOICE3_TOKENIZER_SPECIAL_TOKENS))
            rt[name] = tok
            return tok
        if name == "s3_tokenizer":
            from ....codec.models.s3tokenizer import S3TokenizerV3

            s3 = S3TokenizerV3.from_pretrained()
            rt[name] = s3
            return s3
        if name == "speaker_encoder":
            enc = CAMPPlus()
            weights = None
            if mp:
                from ..cosyvoice2.cosyvoice2 import Model as _CV2

                weights = _CV2._campplus_weights(mp)
            if weights:
                from ....nn.module import load_weights as assign

                enc = assign(enc, enc.sanitize(weights), strict=False).eval()
            rt[name] = enc
            return enc
        raise RuntimeError(
            f"CosyVoice3 runtime component '{name}' not loaded — call "
            "set_runtime() or load from a pretrained path.")

    def sanitize(self, weights: dict) -> dict:
        """Split consolidated checkpoint by stage prefix
        (reference cosyvoice3.py:1000-1007)."""
        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("hift."):
                k = "hifigan." + k[5:]
            if k.startswith("campplus."):
                continue
            out[k] = value
        if self.model.llm is not None:
            llm_keys = {k[len("model.llm."):]: v for k, v in out.items()
                        if k.startswith("model.llm.")}
            fixed = self.model.llm.sanitize(llm_keys)
            out = {k: v for k, v in out.items()
                   if not k.startswith("model.llm.")}
            out.update({f"model.llm.{k}": v for k, v in fixed.items()})
        return out

    def generate(self, text: str, ref_audio=None,
                 ref_text: Optional[str] = None,
                 instruct_text: Optional[str] = None, source_audio=None,
                 max_tokens: int = 2000, stream: bool = False,
                 seed: int = 0, split_long_text: bool = True, **kwargs):
        """Zero-shot / cross-lingual / instruct / VC dispatch
        (reference cosyvoice3.py:1193-1569). ref_audio: 16 kHz mono."""
        from ..base import GenerationResult

        if ref_audio is None:
            raise ValueError("ref_audio is required for CosyVoice3")
        tokenizer = self._runtime("tokenizer")
        s3 = self._runtime("s3_tokenizer")
        spk = self._runtime("speaker_encoder")

        ref_audio = np.asarray(ref_audio, np.float32).reshape(-1)
        if len(ref_audio) > MAX_PROMPT_AUDIO_SECONDS * 16000:
            raise ValueError(
                "CosyVoice3 reference audio longer than 30 s is not "
                "supported (reference cosyvoice3.py:1284-1295)")

        # speech tokens (S3TokenizerV3, 128-mel) + speaker embedding @16 kHz
        from ....codec.models.s3tokenizer import log_mel_spectrogram, padding
        mel, mel_len = padding(
            [np.asarray(log_mel_spectrogram(ref_audio, n_mels=128))])
        prompt_speech_token, _ = s3.quantize(mel, mel_len)
        embedding = np.asarray(spk.inference(jnp.asarray(ref_audio)))

        # prompt mel at 24 kHz, fmax = Nyquist (reference
        # cosyvoice3.py:1320-1349)
        from ....utils import resample_audio
        ref_24k = resample_audio(ref_audio, 16000, 24000)
        prompt_mel = np.asarray(mel_spectrogram(
            ref_24k, n_fft=1920, num_mels=self.model.flow.output_size,
            sampling_rate=24000, hop_size=480, win_size=1920,
            fmin=0.0, fmax=12000.0))  # (1, T, 80)

        # align prompt mel to 2× prompt tokens
        tok_len = int(prompt_speech_token.shape[1])
        if prompt_mel.shape[1] < tok_len * 2:
            tok_len = prompt_mel.shape[1] // 2
        prompt_mel = prompt_mel[:, : tok_len * 2]
        prompt_speech_token = np.asarray(
            prompt_speech_token)[:, :tok_len]

        key = jax.random.PRNGKey(seed)

        def tok(s: str) -> np.ndarray:
            return np.asarray(tokenizer.encode(s), np.int32)

        chunks = ([text] if not split_long_text
                  else split_text(text, tokenize=tokenizer.encode))
        if source_audio is not None:
            chunks = [text]

        for idx, chunk in enumerate(chunks):
            start = time.time()
            key, sub = jax.random.split(key)
            if source_audio is not None:
                src = np.asarray(source_audio, np.float32).reshape(-1)
                smel, smel_len = padding(
                    [np.asarray(log_mel_spectrogram(src, n_mels=128))])
                src_tokens, _ = s3.quantize(smel, smel_len)
                audio = self.model.synthesize_vc(
                    src_tokens, prompt_speech_token, prompt_mel, embedding,
                    key=sub)
                n_text = 0
            elif instruct_text is not None:
                it = instruct_text
                if not it.startswith(INSTRUCT_PROMPT_PREFIX):
                    it = INSTRUCT_PROMPT_PREFIX + it
                if not it.endswith(END_OF_PROMPT):
                    it += END_OF_PROMPT
                text_ids = tok(chunk)
                audio = self.model.synthesize_instruct(
                    text_ids, tok(it), prompt_speech_token, prompt_mel,
                    embedding, key=sub)
                n_text = text_ids.size
            elif ref_text:
                rt = normalize_text(ref_text)
                if not rt.startswith(ZERO_SHOT_PROMPT_PREFIX):
                    rt = ZERO_SHOT_PROMPT_PREFIX + rt
                text_ids = tok(chunk)
                audio = self.model.synthesize(
                    text_ids, tok(rt), prompt_speech_token, prompt_mel,
                    embedding, key=sub)
                n_text = text_ids.size
            else:
                c = chunk if chunk.startswith(ZERO_SHOT_PROMPT_PREFIX) \
                    else ZERO_SHOT_PROMPT_PREFIX + chunk
                text_ids = tok(c)
                audio = self.model.synthesize_cross_lingual(
                    text_ids, prompt_speech_token, prompt_mel, embedding,
                    key=sub)
                n_text = text_ids.size

            audio = np.asarray(audio).reshape(-1)
            elapsed = time.time() - start
            dur = len(audio) / self.sample_rate
            mins, secs = divmod(dur, 60.0)
            yield GenerationResult(
                audio=audio, samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=idx,
                token_count=int(n_text),
                audio_duration=f"{int(mins):02d}:{secs:06.3f}",
                real_time_factor=elapsed / max(dur, 1e-9),
                prompt={"tokens": int(n_text)},
                audio_samples={"samples-per-sec":
                               len(audio) / max(elapsed, 1e-9)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )
