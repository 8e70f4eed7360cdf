"""Kokoro-82M TTS — TPU-native implementation.

Behavioral spec: reference tts/models/kokoro/kokoro.py (Model :57, forward
:111, generate :260). TPU-first design decisions:

- The forward pass is split into TWO jitted programs with shape bucketing:
  stage A (ALBERT → duration predictor) returns per-phoneme durations; the
  host fetches only that tiny int vector; stage B (alignment → F0/N → text
  encoder → iSTFTNet decoder → waveform) runs with a bucketed frame count.
  One dispatch each, so a segment costs 2 compiles amortized + 2 dispatches.
- The duration→alignment matrix is a vectorized interval comparison
  (`frame_idx ∈ [start_i, end_i)`), replacing the reference's host-side
  python repeat loop (kokoro.py:142-148) — it runs on device inside jit.
- Weight-norm is folded at load time in `sanitize` (ConvWeighted →
  plain convs); everything runs channels-last.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import Linear, Module
from ..base import GenerationResult, check_array_shape, format_duration
from .albert import AlbertModelArgs, CustomAlbert
from .istftnet import Decoder
from .modules import ProsodyPredictor, TextEncoder

__all__ = ["Model", "ModelConfig"]


@dataclass
class ModelConfig(BaseModelArgs):
    istftnet: dict = None
    dim_in: int = 64
    dropout: float = 0.2
    hidden_dim: int = 512
    max_conv_dim: int = 512
    max_dur: int = 50
    multispeaker: bool = True
    n_layer: int = 3
    n_mels: int = 80
    n_token: int = 178
    style_dim: int = 128
    text_encoder_kernel_size: int = 5
    plbert: dict = None
    vocab: Dict[str, int] = None
    sample_rate: int = 24000
    model_path: str = ""


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the table: round up (never truncate — clamping would cut audio
    # mid-utterance and corrupt masked-norm valid fractions)
    step = buckets[-1] // 2 or buckets[-1]
    return -(-n // step) * step


_PIPELINE_CACHE: dict = {}

TEXT_BUCKETS = (64, 128, 256, 512)
FRAME_BUCKETS = (256, 512, 768, 1024, 1536, 2048, 3072)


class Model(Module):
    REPO_ID = "prince-canuma/Kokoro-82M"

    def __init__(self, config: ModelConfig, repo_id: Optional[str] = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.vocab = config.vocab or {}
        plbert = dict(config.plbert or {})
        plbert.pop("vocab_size", None)
        self.bert = CustomAlbert(
            AlbertModelArgs.from_dict({"vocab_size": config.n_token, **plbert})
        )
        self.bert_encoder = Linear(self.bert.config.hidden_size, config.hidden_dim)
        self.context_length = self.bert.config.max_position_embeddings
        self.predictor = ProsodyPredictor(
            style_dim=config.style_dim,
            d_hid=config.hidden_dim,
            nlayers=config.n_layer,
            max_dur=config.max_dur,
            dropout=config.dropout,
        )
        self.text_encoder = TextEncoder(
            channels=config.hidden_dim,
            kernel_size=config.text_encoder_kernel_size,
            depth=config.n_layer,
            n_symbols=config.n_token,
        )
        self.decoder = Decoder(
            dim_in=config.hidden_dim,
            style_dim=config.style_dim,
            dim_out=config.n_mels,
            sample_rate=config.sample_rate,
            **(config.istftnet or {}),
        )
        self.repo_id = repo_id

    # ------------------------------------------------------------------
    # Jitted stages
    # ------------------------------------------------------------------

    @staticmethod
    @partial(jax.jit, static_argnames=("speed",))
    def _frontend(model: "Model", input_ids, text_mask, ref_s, speed: float):
        """input_ids (1,T) padded, text_mask (1,T) True=pad, ref_s (1,256)
        → pred_dur (1,T) int32, d (1,T,C+sty), t_en (1,T,C)."""
        sd = model.config.style_dim
        lengths = jnp.sum(~text_mask, axis=-1)
        bert_out, _ = model.bert(
            input_ids, attention_mask=(~text_mask).astype(jnp.int32)
        )
        d_en = model.bert_encoder(bert_out)
        s = ref_s[:, sd:]
        d = model.predictor.text_encoder(d_en, s, lengths, text_mask)
        x = model.predictor.lstm(d, valid_len=lengths)
        duration = model.predictor.duration_proj(x)
        duration = jax.nn.sigmoid(duration).sum(axis=-1) / speed
        pred_dur = jnp.clip(jnp.round(duration), 1, None).astype(jnp.int32)
        pred_dur = jnp.where(text_mask, 0, pred_dur)
        t_en = model.text_encoder(input_ids, lengths, text_mask)
        return pred_dur, d, t_en

    @staticmethod
    @partial(jax.jit, static_argnames=("num_frames",))
    def _synthesize(model: "Model", d, t_en, pred_dur, ref_s, key, num_frames: int):
        """Alignment + prosody + decoder → waveform (B, num_frames*samples/frame).

        Batch-polymorphic: each batch row carries its own durations/style, so
        the serving scheduler can fuse concurrent requests into one dispatch.
        """
        # Stage-boundary dtype: the synthesis stage runs in the decoder's
        # parameter dtype (activation-dtype-wins within a stage, so a mixed
        # policy — e.g. bf16 frontend + f32 decoder — needs the cast here).
        ddt = model.decoder.F0_conv.weight.dtype
        d = d.astype(ddt)
        t_en = t_en.astype(ddt)
        ref_s = ref_s.astype(ddt)
        ends = jnp.cumsum(pred_dur, axis=1)  # (B, T)
        starts = ends - pred_dur
        frame_idx = jnp.arange(num_frames)
        # (B, T_text, num_frames) one-hot interval alignment
        aln = (
            (frame_idx[None, None, :] >= starts[..., None])
            & (frame_idx[None, None, :] < ends[..., None])
        ).astype(d.dtype)
        # Per-row valid fraction: norm statistics and reversed-LSTM carries
        # ignore the bucket padding, so output is independent of the bucket
        # size (matches the reference's exact-length behavior).
        valid_frac = ends[:, -1].astype(jnp.float32) / num_frames
        en = jnp.einsum("btc,btf->bfc", d, aln)
        s = ref_s[:, model.config.style_dim:]
        F0_pred, N_pred = model.predictor.F0Ntrain(en, s, valid_frac)
        asr = jnp.einsum("btc,btf->bfc", t_en, aln)
        audio = model.decoder(
            asr, F0_pred, N_pred, ref_s[:, : model.config.style_dim], key, valid_frac
        )
        # int16 on device: halves the device→host transfer (the tunnel is
        # the bottleneck); hosts convert back to f32 — WAV-precision audio.
        return (
            jnp.clip(audio, -1.0, 1.0) * 32767.0
        ).astype(jnp.int16)

    @staticmethod
    @partial(jax.jit, static_argnames=("speed", "num_frames"))
    def _forward_fused(model: "Model", input_ids, text_mask, ref_s, key,
                       speed: float, num_frames: int):
        """Frontend + synthesis as ONE program → (audio_i16, pred_dur).

        One dispatch and one host fetch per utterance (the two-stage path
        costs two device round trips — significant on a tunneled TPU). The
        caller picks num_frames up front; if the predicted total exceeds it
        the host falls back to the exact two-stage path.
        """
        pred_dur, d, t_en = Model._frontend(model, input_ids, text_mask,
                                            ref_s, speed)
        audio = Model._synthesize(model, d, t_en, pred_dur, ref_s, key,
                                  num_frames)
        return audio, pred_dur

    # ------------------------------------------------------------------
    # Public forward (phonemes → audio), reference `Model.__call__` parity
    # ------------------------------------------------------------------

    @dataclass
    class Output:
        audio: np.ndarray
        pred_dur: Optional[np.ndarray] = None

    def __call__(self, phonemes: str, ref_s, speed: float = 1.0,
                 return_output: bool = False, key: Optional[jax.Array] = None,
                 fused_frames: Optional[int] = None):
        input_ids = [self.vocab.get(p) for p in phonemes]
        input_ids = [i for i in input_ids if i is not None]
        assert len(input_ids) + 2 <= self.context_length
        ids = [0, *input_ids, 0]
        T = len(ids)
        Tpad = _bucket(T, TEXT_BUCKETS)
        ids_arr = jnp.asarray([ids + [0] * (Tpad - T)], jnp.int32)
        mask = jnp.asarray([[False] * T + [True] * (Tpad - T)])
        # Activations follow the parameter dtype (bf16 after nn.cast_floats);
        # phase-critical paths (NSF source, ISTFT head) pin themselves to f32.
        cdtype = self.bert_encoder.weight.dtype
        ref_s = jnp.asarray(ref_s, cdtype)
        if ref_s.ndim == 1:
            ref_s = ref_s[None]
        if key is None:
            key = jax.random.PRNGKey(0)
        samples_per_frame = self.decoder.generator.total_upsample * 2

        if fused_frames is not None:
            # one dispatch, one fetch; exact fallback if frames overflow
            num_frames = _bucket(fused_frames, FRAME_BUCKETS)
            audio, pred_dur = self._forward_fused(
                self, ids_arr, mask, ref_s, key, float(speed), num_frames
            )
            audio_np_raw, pred_dur_np = jax.device_get((audio, pred_dur))
            pred_dur_np = np.asarray(pred_dur_np)
            total_frames = int(pred_dur_np.sum())
            if total_frames <= num_frames:
                audio_np = (
                    np.asarray(audio_np_raw)[0][: total_frames * samples_per_frame]
                    .astype(np.float32)
                    / 32767.0
                )
                if return_output:
                    return self.Output(audio=audio_np,
                                       pred_dur=pred_dur_np[0][:T])
                return audio_np
            # overflow: fall through to the exact two-stage path

        pred_dur, d, t_en = self._frontend(self, ids_arr, mask, ref_s, float(speed))
        pred_dur_np = np.asarray(jax.device_get(pred_dur))  # single tiny sync
        total_frames = int(pred_dur_np.sum())
        num_frames = _bucket(total_frames, FRAME_BUCKETS)

        audio = self._synthesize(self, d, t_en, pred_dur, ref_s, key, num_frames)
        audio_np = (
            np.asarray(jax.device_get(audio))[0][: total_frames * samples_per_frame]
            .astype(np.float32)
            / 32767.0
        )
        if return_output:
            return self.Output(audio=audio_np, pred_dur=pred_dur_np[0][:T])
        return audio_np

    def batch_synthesize(self, phonemes_list, ref_s_list, speed: float = 1.0,
                         key: Optional[jax.Array] = None):
        """Fuse several requests into ONE frontend + ONE synthesize dispatch.

        Serving path (BASELINE: "server batches concurrent TTS/STT streams
        per chip"): all rows share the text/frame bucket and batch is padded
        to a power of two, so concurrent requests cost one XLA program
        instead of N. Returns a list of Output (audio trimmed per request).
        """
        B = len(phonemes_list)
        idseqs = []
        for ph in phonemes_list:
            ids = [self.vocab.get(p) for p in ph]
            ids = [i for i in ids if i is not None]
            idseqs.append([0, *ids, 0])
        Tmax = max(len(s) for s in idseqs)
        Tpad = _bucket(Tmax, TEXT_BUCKETS)
        Bpad = 1 << (B - 1).bit_length()  # pad batch to pow2 → few compiles
        rows = idseqs + [idseqs[-1]] * (Bpad - B)
        ids_arr = jnp.asarray(
            [s + [0] * (Tpad - len(s)) for s in rows], jnp.int32
        )
        mask = jnp.asarray(
            [[False] * len(s) + [True] * (Tpad - len(s)) for s in rows]
        )
        cdtype = self.bert_encoder.weight.dtype
        refs = [np.asarray(r, np.float32).reshape(-1) for r in ref_s_list]
        refs = refs + [refs[-1]] * (Bpad - B)
        ref_s = jnp.asarray(np.stack(refs), cdtype)

        pred_dur, d, t_en = self._frontend(self, ids_arr, mask, ref_s, float(speed))
        pred_dur_np = np.asarray(jax.device_get(pred_dur))
        totals = pred_dur_np.sum(axis=1)
        num_frames = _bucket(int(totals.max()), FRAME_BUCKETS)
        if key is None:
            key = jax.random.PRNGKey(0)
        # Every request keeps its own noise stream (same default key a
        # sequential call would use) → batching does not change audio.
        keys = jnp.broadcast_to(key, (Bpad, 2)) if key.ndim == 1 else key
        audio = self._synthesize(self, d, t_en, pred_dur, ref_s, keys, num_frames)
        spf = self.decoder.generator.total_upsample * 2
        out = np.asarray(jax.device_get(audio)).astype(np.float32) / 32767.0
        return [
            self.Output(
                audio=out[i][: int(totals[i]) * spf],
                pred_dur=pred_dur_np[i][: len(idseqs[i])],
            )
            for i in range(B)
        ]

    def make_batcher(self, **kwargs):
        """Serving batcher: fuses concurrent requests into one dispatch."""
        from ....serving import KokoroBatcher

        return KokoroBatcher(self, **kwargs)

    # ------------------------------------------------------------------

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def _get_pipeline(self, lang_code: str):
        # Pipelines hold a back-reference to the model, so they are cached in
        # a module-level registry instead of on the pytree (avoids a flatten
        # cycle and keeps the jit treedef clean).
        key = id(self)
        if key not in _PIPELINE_CACHE:
            _PIPELINE_CACHE[key] = {}
            # evict when the model dies — the pipeline back-references the
            # model, so an unbounded id-keyed cache would keep every model
            # (and its jit caches) immortal across server reloads
            import weakref

            try:
                weakref.finalize(self, _PIPELINE_CACHE.pop, key, None)
            except TypeError:
                pass  # non-weakref-able object: fall back to unbounded cache
        cache = _PIPELINE_CACHE[key]
        if lang_code not in cache:
            from .pipeline import KokoroPipeline

            cache[lang_code] = KokoroPipeline(
                model=self,
                repo_id=self.repo_id or self.config.model_path or self.REPO_ID,
                lang_code=lang_code,
            )
        return cache[lang_code]

    def generate(self, text: str, voice: Optional[str] = None, speed: float = 1.0,
                 lang_code: str = "a", split_pattern: str = r"\n+", **kwargs):
        pipeline = self._get_pipeline(lang_code)
        if voice is None:
            voice = "af_heart"
        start_time = time.time()
        for segment_idx, (graphemes, phonemes, audio) in enumerate(
            pipeline(text, voice=voice, speed=speed, split_pattern=split_pattern)
        ):
            now = time.time()
            segment_time = now - start_time
            start_time = now
            samples = int(audio.shape[-1]) if audio is not None else 0
            assert samples > 0, "No audio generated"
            token_count = len(phonemes) if phonemes else 0
            sr = self.config.sample_rate
            audio_duration = samples / sr
            rtf = segment_time / audio_duration if audio_duration > 0 else 0
            yield GenerationResult(
                audio=np.asarray(audio).reshape(-1),
                samples=samples,
                sample_rate=sr,
                segment_idx=segment_idx,
                token_count=token_count,
                audio_duration=format_duration(audio_duration),
                real_time_factor=round(rtf, 2),
                prompt={
                    "tokens": token_count,
                    "tokens-per-sec": (
                        round(token_count / segment_time, 2) if segment_time > 0 else 0
                    ),
                },
                audio_samples={
                    "samples": samples,
                    "samples-per-sec": (
                        round(samples / segment_time, 2) if segment_time > 0 else 0
                    ),
                },
                processing_time_seconds=segment_time,
                peak_memory_usage=0.0,
            )

    # ------------------------------------------------------------------
    # Checkpoint sanitize: torch layouts → ours, weight-norm folded
    # ------------------------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        from ....nn.module import flatten_params
        from ..base import orient_to

        expected = {
            k: tuple(v.shape) for k, v in flatten_params(self).items()
        }
        out = {}
        # 1) fold weight-norm pairs
        gs = {k: v for k, v in weights.items() if k.endswith("weight_g")}
        for gkey, g in gs.items():
            vkey = gkey[:-1] + "v"  # weight_g -> weight_v
            v = np.asarray(weights[vkey], np.float32)
            gv = np.asarray(g, np.float32)
            norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            weights[gkey.rsplit(".", 1)[0] + ".weight"] = gv * v / np.maximum(norm, 1e-12)
        weights = {
            k: v for k, v in weights.items()
            if not (k.endswith("weight_g") or k.endswith("weight_v"))
        }

        transposed_convT = set()
        for key, w in weights.items():
            if "position_ids" in key:
                continue
            w = np.asarray(w)
            nk = key
            # LSTM key remapping (torch → forward/backward submodules)
            lstm_map = {
                "weight_ih_l0_reverse": "backward.Wx",
                "weight_hh_l0_reverse": "backward.Wh",
                "bias_ih_l0_reverse": "backward.bias_ih",
                "bias_hh_l0_reverse": "backward.bias_hh",
                "weight_ih_l0": "forward.Wx",
                "weight_hh_l0": "forward.Wh",
                "bias_ih_l0": "forward.bias_ih",
                "bias_hh_l0": "forward.bias_hh",
            }
            matched = False
            for suffix, repl in lstm_map.items():
                if key.endswith(suffix):
                    nk = key[: -len(suffix)] + repl
                    matched = True
                    break
            if matched:
                out[nk] = w
                continue
            # gamma/beta → weight/bias (old layer-norm naming)
            if key.endswith(".gamma"):
                out[key[: -len(".gamma")] + ".weight"] = w
                continue
            if key.endswith(".beta"):
                out[key[: -len(".beta")] + ".bias"] = w
                continue
            # conv weights: orient against the model's expected layout
            # (handles torch conv (O,I,K), torch convT (I,O,K), and
            # already-ours layouts idempotently)
            if key.endswith(".weight") and w.ndim == 3 and nk in expected:
                w = orient_to(w, expected[nk])
            # snake alphas keep their (1, C, 1) shape
            out[nk] = w
        return out
