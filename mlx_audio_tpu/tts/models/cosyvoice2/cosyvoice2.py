"""CosyVoice2 TTS: Qwen2 speech-token LM → flow matching → HiFT vocoder.

TPU-native re-implementation of the reference
mlx_audio/tts/models/cosyvoice2/cosyvoice2.py:23-1345. All three stages run
as jitted graphs: the LM decodes on device (one dispatch per utterance), the
flow's 10-step CFG Euler solve is one program per token-length bucket, and
HiFT mel→wav is one program per mel-length bucket.

Modes (reference cosyvoice2.py:251-646): zero-shot (ref audio + transcript),
cross-lingual (ref audio only), instruct (style text), and voice conversion
(source audio, no LM).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Any, Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.s3gen import (
    CAMPPlus,
    CausalMaskedDiffWithXvec,
    CFMParams,
    ConditionalCFM,
    ConditionalDecoder,
    HiFTGenerator,
    UpsampleConformerEncoder,
)
from ....codec.models.s3gen.mel import mel_spectrogram
from ....nn.module import Module, load_weights
from .config import CosyVoice2Config, ModelConfig
from .llm import Qwen2LM

__all__ = ["CosyVoice2", "Model", "build_cosyvoice2"]

TOKEN_BUCKET = 50  # flow token-length granularity (2 s at 25 Hz)


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


def build_cosyvoice2(config: CosyVoice2Config) -> "CosyVoice2":
    """Construct all three stages from a CosyVoice2Config."""
    f = config.flow
    encoder = UpsampleConformerEncoder(
        input_size=f.input_size,
        output_size=f.encoder_output_size,
        attention_heads=f.encoder_attention_heads,
        linear_units=f.encoder_linear_units,
        num_blocks=f.encoder_num_blocks,
        num_up_blocks=f.encoder_num_up_blocks,
        static_chunk_size=f.encoder_static_chunk_size,
        pre_lookahead_len=f.pre_lookahead_len,
        upsample_stride=f.encoder_upsample_stride,
    )
    estimator = ConditionalDecoder(
        in_channels=f.decoder_in_channels,
        out_channels=f.decoder_out_channel,
        channels=list(f.decoder_channels),
        attention_head_dim=f.decoder_attention_head_dim,
        n_blocks=f.decoder_n_blocks,
        num_mid_blocks=f.decoder_num_mid_blocks,
        num_heads=f.decoder_num_heads,
        static_chunk_size=f.decoder_static_chunk_size,
        num_decoding_left_chunks=f.decoder_num_decoding_left_chunks,
    )
    cfm = ConditionalCFM(
        in_channels=f.cfm_in_channels,
        cfm_params=CFMParams(sigma_min=f.cfm_sigma_min,
                             t_scheduler=f.cfm_t_scheduler,
                             inference_cfg_rate=f.cfm_inference_cfg_rate),
        estimator=estimator)
    cfm.MEL_CHANNELS = f.output_size
    flow = CausalMaskedDiffWithXvec(
        input_size=f.input_size, output_size=f.output_size,
        spk_embed_dim=f.spk_embed_dim, vocab_size=f.vocab_size,
        input_frame_rate=f.input_frame_rate,
        token_mel_ratio=f.token_mel_ratio,
        pre_lookahead_len=f.pre_lookahead_len,
        n_timesteps=f.n_timesteps, encoder=encoder, decoder=cfm)

    h = config.hifigan
    hifigan = HiFTGenerator(
        in_channels=h.in_channels, base_channels=h.base_channels,
        nb_harmonics=h.nb_harmonics, sampling_rate=h.sampling_rate,
        nsf_alpha=h.nsf_alpha, nsf_sigma=h.nsf_sigma,
        nsf_voiced_threshold=h.nsf_voiced_threshold,
        upsample_rates=list(h.upsample_rates),
        upsample_kernel_sizes=list(h.upsample_kernel_sizes),
        istft_params={"n_fft": h.istft_n_fft, "hop_len": h.istft_hop_len},
        resblock_kernel_sizes=list(h.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in h.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(h.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[list(d) for d in
                                        h.source_resblock_dilation_sizes],
        use_interpolation=h.use_interpolation)

    return CosyVoice2(config, Qwen2LM(config.llm), flow, hifigan)


class CosyVoice2(Module):
    """Composite model (reference cosyvoice2.py:23-643)."""

    def __init__(self, config: Optional[CosyVoice2Config] = None,
                 llm: Optional[Qwen2LM] = None,
                 flow: Optional[CausalMaskedDiffWithXvec] = None,
                 hifigan: Optional[HiFTGenerator] = None):
        self.config = config or CosyVoice2Config()
        self.llm = llm
        self.flow = flow
        self.hifigan = hifigan

    # ------------------------------------------------------------------
    def generate_tokens(self, text, prompt_text=None, prompt_speech_token=None,
                        sampling: int = 25, max_token_text_ratio: float = 20.0,
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
        run in lock-step (CosyVoice2 stop rule: tok == V; fill tokens fed
        but not emitted); flow + HiFT vocoding stay per-request."""
        from .batcher import RASBatcher

        return RASBatcher(self, lm=self.llm, v3=False, **kwargs)

    def tokens_to_mel(self, tokens: np.ndarray, prompt_token: np.ndarray,
                      prompt_feat, embedding, n_timesteps: Optional[int] = None,
                      key=None, streaming: bool = False) -> jnp.ndarray:
        """tokens (1, T) → mel (1, T*2, 80) for the non-prompt region."""
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        prompt_token = np.asarray(prompt_token, np.int32).reshape(1, -1)
        n_new = tokens.shape[1]
        padded = _pad_tokens(tokens)
        if key is None:
            key = jax.random.PRNGKey(0)
        feat = _flow_infer(
            self.flow, jnp.asarray(padded),
            jnp.array([n_new], jnp.int32), jnp.asarray(prompt_token),
            jnp.array([prompt_token.shape[1]], jnp.int32),
            jnp.asarray(prompt_feat), jnp.asarray(embedding), key,
            n_timesteps or self.flow.n_timesteps, streaming)
        return feat[:, : n_new * self.flow.token_mel_ratio]

    def mel_to_audio(self, mel, key=None) -> np.ndarray:
        if key is None:
            key = jax.random.PRNGKey(0)
        wav = _hift_infer(self.hifigan, jnp.asarray(mel), key)
        return np.asarray(wav)

    # ------------------------------------------------------------------
    def synthesize(self, text, prompt_text, prompt_speech_token, prompt_mel,
                   speaker_embedding, sampling: int = 25,
                   n_timesteps: int = 10, max_token_text_ratio: float = 20.0,
                   min_token_text_ratio: float = 2.0, key=None) -> np.ndarray:
        """Full zero-shot pipeline (reference cosyvoice2.py:174-311)."""
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

    def synthesize_zero_shot(self, *args, **kwargs):
        return self.synthesize(*args, **kwargs)

    def synthesize_cross_lingual(self, text, prompt_speech_token, prompt_mel,
                                 speaker_embedding, sampling: int = 25,
                                 n_timesteps: int = 10,
                                 max_token_text_ratio: float = 20.0,
                                 min_token_text_ratio: float = 2.0,
                                 key=None) -> np.ndarray:
        """LM sees no prompt; flow keeps speaker identity
        (reference cosyvoice2.py:312-402)."""
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
        """Instruct text as prompt, no prompt speech in the LM
        (reference cosyvoice2.py:403-493)."""
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
        """Voice conversion: no LM (reference cosyvoice2.py:494-546)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k2, k3 = jax.random.split(key)
        mel = self.tokens_to_mel(source_speech_token, prompt_speech_token,
                                 prompt_mel, speaker_embedding, n_timesteps,
                                 key=k2)
        return self.mel_to_audio(mel, key=k3)

    def synthesize_streaming(self, text, prompt_text, prompt_speech_token,
                             prompt_mel, speaker_embedding,
                             chunk_tokens: int = 50, **kwargs
                             ) -> Generator[np.ndarray, None, None]:
        """Chunked synthesis: generate all tokens, vocode per chunk with
        streaming (chunk-masked) flow attention
        (reference cosyvoice2.py:547-643)."""
        key = kwargs.pop("key", None) or jax.random.PRNGKey(
            np.random.randint(0, 2**31 - 1))
        k1, key = jax.random.split(key)
        tokens = self.generate_tokens(text, prompt_text, prompt_speech_token,
                                      key=k1, **kwargs)
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
    """generate()-API wrapper (reference cosyvoice2.py:874-1345).

    Heavy runtime dependencies (text tokenizer, S3 speech tokenizer, CAM++
    speaker encoder) are injectable via `set_runtime` for offline tests.
    """

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate
        inner_cfg = self.config.cosyvoice2 or CosyVoice2Config()
        self.model = build_cosyvoice2(inner_cfg)

    def make_batcher(self, **kwargs):
        """Serving batcher (server entry point): delegates to the inner
        CosyVoice2 engine, whose generate_tokens() checks the hook."""
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

    # CosyVoice2-specific control tokens the reference adds at load
    # (reference cosyvoice2.py:950-975)
    _SPECIAL_TOKENS = [
        "<|endofprompt|>", "[breath]", "<strong>", "</strong>", "[noise]",
        "[laughter]", "[cough]", "[clucking]", "[accent]", "[quick_breath]",
        "<laughter>", "</laughter>", "[hissing]", "[sigh]",
        "[vocalized-noise]", "[lipsmack]", "[mn]",
    ]

    def _runtime(self, name):
        """Explicit runtime slot → lazy wiring from the checkpoint dir
        (reference cosyvoice2.py:940-1028): HF tokenizer from
        `<dir>/tokenizer` or root plus control special-tokens, S3 speech
        tokenizer from its published repo, CAM++ weights from the
        consolidated `campplus.*` keys or campplus.safetensors/npz."""
        rt = Model._RUNTIME.setdefault(id(self), {})
        if name in rt:
            return rt[name]
        mp = getattr(self.config, "model_path", None)
        if name == "tokenizer" and mp:
            from ....utils import load_hf_tokenizer

            tok_dir = Path(mp) / "tokenizer"
            tok = load_hf_tokenizer(tok_dir if tok_dir.exists() else mp)
            tok.add_special_tokens(
                {"additional_special_tokens": list(self._SPECIAL_TOKENS)})
            rt[name] = tok
            return tok
        if name == "s3_tokenizer":
            from ....codec.models.s3tokenizer import S3TokenizerV2

            s3 = S3TokenizerV2.from_pretrained("speech_tokenizer_v2_25hz")
            rt[name] = s3
            return s3
        if name == "speaker_encoder":
            enc = CAMPPlus()
            weights = self._campplus_weights(mp) if mp else None
            if weights:
                from ....nn.module import load_weights as assign

                enc = assign(enc, enc.sanitize(weights), strict=False).eval()
            rt[name] = enc
            return enc
        raise RuntimeError(
            f"CosyVoice2 runtime component '{name}' not loaded — call "
            "set_runtime() or load from a pretrained path.")

    @staticmethod
    def _campplus_weights(model_path) -> Optional[dict]:
        """campplus.* keys from the consolidated weights, else a separate
        campplus.safetensors / campplus.npz (reference cosyvoice2.py:
        991-1028)."""
        from ....utils import load_weight_files

        mp = Path(model_path)
        try:
            consolidated = load_weight_files(mp)
        except FileNotFoundError:
            consolidated = {}
        spk = {k[len("campplus."):]: v for k, v in consolidated.items()
               if k.startswith("campplus.")}
        if spk:
            return spk
        for fname in ("campplus.safetensors", "campplus.npz"):
            f = mp / fname
            if f.exists():
                return load_weight_files(f)
        return None

    def sanitize(self, weights: dict) -> dict:
        """Split consolidated checkpoint by stage prefix
        (reference cosyvoice2.py:645-873)."""
        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("hift."):
                k = "hifigan." + k[5:]
            if k.startswith("campplus."):
                continue  # loaded into the speaker encoder separately
            out[k] = value
        if self.model.llm is not None:
            llm_keys = {k[len("model.llm."):]: v for k, v in out.items()
                        if k.startswith("model.llm.")}
            fixed = self.model.llm.sanitize(llm_keys)
            out = {k: v for k, v in out.items()
                   if not k.startswith("model.llm.")}
            out.update({f"model.llm.{k}": v for k, v in fixed.items()})
        return out

    def generate(self, text: str, ref_audio=None, ref_text: Optional[str] = None,
                 instruct_text: Optional[str] = None, source_audio=None,
                 voice: Optional[str] = None, speed: float = 1.0,
                 lang_code: str = "a", temperature: float = 0.7,
                 max_tokens: int = 2000, verbose: bool = True,
                 stream: bool = False, streaming_interval: float = 2.0,
                 seed: int = 0, **kwargs):
        """Zero-shot / cross-lingual / instruct / VC dispatch
        (reference cosyvoice2.py:1031-1345). ref_audio: 16 kHz mono.

        ``voice``/``speed``/``lang_code``/``temperature``/``streaming_interval``
        are accepted for CLI option parity and ignored, exactly as the
        reference documents (cosyvoice2.py:1068-1076: "Ignored"). ``stream``
        is likewise accepted; like the reference, generation yields a single
        result. ``verbose`` prints mode + timing status.
        """
        from ..base import GenerationResult

        if ref_audio is None:
            raise ValueError("ref_audio is required for CosyVoice2")
        start = time.time()
        tokenizer = self._runtime("tokenizer")
        s3 = self._runtime("s3_tokenizer")
        spk = self._runtime("speaker_encoder")

        ref_audio = np.asarray(ref_audio, np.float32).reshape(-1)
        # speech tokens + speaker embedding from 16 kHz reference
        from ....codec.models.s3tokenizer import log_mel_spectrogram, padding
        mel, mel_len = padding([np.asarray(log_mel_spectrogram(ref_audio))])
        prompt_speech_token, _ = s3.quantize(mel, mel_len)
        embedding = np.asarray(spk.inference(jnp.asarray(ref_audio)))

        # prompt mel at 24 kHz for the flow
        from ....utils import resample_audio
        ref_24k = resample_audio(ref_audio, 16000, 24000)
        prompt_mel = np.asarray(mel_spectrogram(
            ref_24k, num_mels=self.model.flow.output_size))  # (1, T, M)
        # align prompt mel to 2× prompt tokens (reference pads/trims)
        want = prompt_speech_token.shape[1] * 2
        if prompt_mel.shape[1] >= want:
            prompt_mel = prompt_mel[:, :want]
        else:
            prompt_mel = np.pad(prompt_mel,
                                ((0, 0), (0, want - prompt_mel.shape[1]),
                                 (0, 0)))

        key = jax.random.PRNGKey(seed)
        text_ids = np.asarray(tokenizer.encode(text), np.int32)

        if verbose:
            mode = ("vc" if source_audio is not None else
                    "instruct" if instruct_text is not None else
                    "zero-shot" if ref_text else "cross-lingual")
            print(f"CosyVoice2 {mode}: {len(text_ids)} text tokens, "
                  f"{prompt_speech_token.shape[1]} prompt speech tokens")

        if source_audio is not None:
            src = np.asarray(source_audio, np.float32).reshape(-1)
            smel, smel_len = padding([np.asarray(log_mel_spectrogram(src))])
            src_tokens, _ = s3.quantize(smel, smel_len)
            audio = self.model.synthesize_vc(src_tokens, prompt_speech_token,
                                             prompt_mel, embedding, key=key)
        elif instruct_text is not None:
            it = np.asarray(tokenizer.encode(instruct_text + "<|endofprompt|>"),
                            np.int32)
            audio = self.model.synthesize_instruct(
                text_ids, it, prompt_speech_token, prompt_mel, embedding,
                key=key)
        elif ref_text:
            pt = np.asarray(tokenizer.encode(ref_text), np.int32)
            audio = self.model.synthesize(text_ids, pt, prompt_speech_token,
                                          prompt_mel, embedding, key=key)
        else:
            audio = self.model.synthesize_cross_lingual(text_ids, prompt_speech_token,
                                              prompt_mel, embedding, key=key)

        audio = np.asarray(audio).reshape(-1)
        elapsed = time.time() - start
        dur = len(audio) / self.sample_rate
        if verbose:
            print(f"CosyVoice2: {dur:.2f}s audio in {elapsed:.2f}s")
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=int(np.asarray(text_ids).size),
            audio_duration=f"{dur:.2f}s",
            real_time_factor=elapsed / max(dur, 1e-9),
            prompt={"tokens": int(np.asarray(text_ids).size)},
            audio_samples={"samples-per-sec":
                           len(audio) / max(elapsed, 1e-9)},
            processing_time_seconds=elapsed,
            peak_memory_usage=0.0,
        )
