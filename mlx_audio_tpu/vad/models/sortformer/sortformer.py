"""Sortformer 4-speaker end-to-end diarization.

Behavioral spec: reference vad/models/sortformer/sortformer.py (mel features
:43, FastConformer :446, BART-style transformer :597, modules :641, offline
generate :811, streaming spkcache/FIFO :926-1024). TPU-native: the whole
mel→preds forward is one jitted program with bucketed frame length; the
streaming step reuses it over the assembled [spkcache|fifo|chunk] sequence.
Parameter names match the converted checkpoint (q_proj/layers_0/...).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Generator, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import hanning, mel_filters, stft
from ....nn import Conv1d, Conv2d, Embedding, LayerNorm, Linear, Module
from .config import (
    FCEncoderConfig,
    ModelConfig,
    ModulesConfig,
    ProcessorConfig,
    TFEncoderConfig,
)

__all__ = ["Model", "ModelConfig", "DiarizationOutput", "DiarizationSegment",
           "StreamingState", "extract_mel_features"]

_LOG_GUARD = 2**-24


def extract_mel_features(
    waveform: jax.Array,
    sample_rate: int = 16000,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    n_mels: int = 80,
    preemphasis_coeff: float = 0.97,
    normalize: str = "per_feature",
    pad_to: int = 16,
) -> jax.Array:
    """NeMo FilterbankFeatures-compatible log-mel → (batch, n_mels, frames)."""
    x = jnp.asarray(waveform, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    x = jnp.concatenate([x[:, :1], x[:, 1:] - preemphasis_coeff * x[:, :-1]], axis=1)
    fb = mel_filters(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                     norm="slaney", mel_scale="slaney")
    window = hanning(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.concatenate(
            [jnp.zeros(left), window, jnp.zeros(n_fft - win_length - left)]
        )
    spec = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                window=window, center=True, pad_mode="constant")
    power = jnp.abs(spec) ** 2  # (B, frames, freq)
    mel = jnp.log(jnp.matmul(power, fb.T) + _LOG_GUARD)  # (B, frames, mels)
    feats = jnp.swapaxes(mel, 1, 2)  # (B, mels, frames)
    if normalize == "per_feature":
        mean = feats.mean(axis=2, keepdims=True)
        var = ((feats - mean) ** 2).sum(axis=2, keepdims=True) / (feats.shape[2] - 1)
        feats = (feats - mean) / (jnp.sqrt(var) + 1e-5)
    if pad_to > 0 and feats.shape[2] % pad_to:
        feats = jnp.pad(feats, [(0, 0), (0, 0), (0, pad_to - feats.shape[2] % pad_to)])
    return feats


class ConvSubsampling(Module):
    """dw_striding subsampling (NeMo layer indices preserved in names)."""

    def __init__(self, config: FCEncoderConfig):
        ch = config.subsampling_conv_channels
        ks = config.subsampling_conv_kernel_size
        st = config.subsampling_conv_stride
        pad = (ks - 1) // 2
        self.layers_0 = Conv2d(1, ch, ks, stride=st, padding=pad)
        self.layers_2 = Conv2d(ch, ch, ks, stride=st, padding=pad, groups=ch)
        self.layers_3 = Conv2d(ch, ch, 1)
        self.layers_5 = Conv2d(ch, ch, ks, stride=st, padding=pad, groups=ch)
        self.layers_6 = Conv2d(ch, ch, 1)
        feat_in = config.num_mel_bins
        self.linear = Linear(ch * math.ceil(feat_in / 8), config.hidden_size)

    def __call__(self, x, lengths):
        # x: (B, mels, T) → NHWC (B, T, mels, 1)
        x = jnp.swapaxes(x, 1, 2)[..., None]
        x = jax.nn.relu(self.layers_0(x))
        x = jax.nn.relu(self.layers_3(self.layers_2(x)))
        x = jax.nn.relu(self.layers_6(self.layers_5(x)))
        b, t, f, c = x.shape
        x = jnp.swapaxes(x, 2, 3).reshape(b, t, c * f)
        x = self.linear(x)
        for _ in range(3):
            lengths = jnp.floor((lengths - 1) / 2).astype(jnp.int32) + 1
        return x, lengths


class RelPositionMultiHeadAttention(Module):
    def __init__(self, config: FCEncoderConfig):
        n_feat = config.hidden_size
        self.q_proj = Linear(n_feat, n_feat, bias=config.attention_bias)
        self.k_proj = Linear(n_feat, n_feat, bias=config.attention_bias)
        self.v_proj = Linear(n_feat, n_feat, bias=config.attention_bias)
        self.o_proj = Linear(n_feat, n_feat, bias=config.attention_bias)
        self.relative_k_proj = Linear(n_feat, n_feat, bias=False)
        self.h = config.num_attention_heads
        self.d_k = n_feat // self.h
        self.bias_u = jnp.zeros((self.h, self.d_k))
        self.bias_v = jnp.zeros((self.h, self.d_k))

    @staticmethod
    def rel_shift(x):
        b, h, q, p = x.shape
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (1, 0)])
        return x.reshape(b, h, p + 1, q)[:, :, 1:].reshape(b, h, q, p)

    def __call__(self, x, pos_emb, mask=None):
        B, T, _ = x.shape
        q = self.q_proj(x).reshape(B, T, self.h, self.d_k)
        k = jnp.transpose(self.k_proj(x).reshape(B, T, self.h, self.d_k), (0, 2, 1, 3))
        v = jnp.transpose(self.v_proj(x).reshape(B, T, self.h, self.d_k), (0, 2, 1, 3))
        p = jnp.transpose(
            self.relative_k_proj(pos_emb).reshape(1, -1, self.h, self.d_k),
            (0, 2, 1, 3),
        )
        q_u = jnp.transpose(q + self.bias_u, (0, 2, 1, 3))
        q_v = jnp.transpose(q + self.bias_v, (0, 2, 1, 3))
        ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k, preferred_element_type=jnp.float32)
        bd = self.rel_shift(
            jnp.einsum("bhtd,bhpd->bhtp", q_v, p, preferred_element_type=jnp.float32)
        )[..., : T]
        scores = (ac + bd) / math.sqrt(self.d_k)
        if mask is not None:
            scores = jnp.where(mask, -1e4, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask, 0.0, attn)
        out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, -1)
        return self.o_proj(out)


class ConformerFeedForward(Module):
    def __init__(self, d_model, d_ff):
        self.linear1 = Linear(d_model, d_ff)
        self.linear2 = Linear(d_ff, d_model)

    def __call__(self, x):
        return self.linear2(jax.nn.silu(self.linear1(x)))


class BatchNorm1d(Module):
    def __init__(self, num_features):
        self.weight = jnp.ones((num_features,))
        self.bias = jnp.zeros((num_features,))
        self.running_mean = jnp.zeros((num_features,))
        self.running_var = jnp.ones((num_features,))
        self.eps = 1e-5

    def __call__(self, x):
        return (x - self.running_mean) * jax.lax.rsqrt(
            self.running_var + self.eps
        ) * self.weight + self.bias


class ConformerConvolution(Module):
    def __init__(self, config: FCEncoderConfig):
        d = config.hidden_size
        k = config.conv_kernel_size
        self.pointwise_conv1 = Conv1d(d, d * 2, 1)
        self.depthwise_conv = Conv1d(d, d, k, padding=(k - 1) // 2, groups=d)
        self.norm = BatchNorm1d(d)
        self.pointwise_conv2 = Conv1d(d, d, 1)

    def __call__(self, x):
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = jax.nn.silu(self.norm(self.depthwise_conv(x)))
        return self.pointwise_conv2(x)


class ConformerLayer(Module):
    def __init__(self, config: FCEncoderConfig):
        d = config.hidden_size
        self.norm_feed_forward1 = LayerNorm(d)
        self.feed_forward1 = ConformerFeedForward(d, config.intermediate_size)
        self.norm_self_att = LayerNorm(d)
        self.self_attn = RelPositionMultiHeadAttention(config)
        self.norm_conv = LayerNorm(d)
        self.conv = ConformerConvolution(config)
        self.norm_feed_forward2 = LayerNorm(d)
        self.feed_forward2 = ConformerFeedForward(d, config.intermediate_size)
        self.norm_out = LayerNorm(d)

    def __call__(self, x, pos_emb, mask=None):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb, mask)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


def _rel_pos_emb(seq_len: int, d_model: int) -> np.ndarray:
    positions = np.arange(seq_len - 1, -seq_len, -1, dtype=np.float32)
    div = np.exp(np.arange(0, d_model, 2, np.float32) * -(math.log(10000.0) / d_model))
    ang = positions[:, None] * div[None, :]
    pe = np.zeros((len(positions), d_model), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe[None]


class FastConformerEncoder(Module):
    def __init__(self, config: FCEncoderConfig):
        self.config = config
        self.subsampling = ConvSubsampling(config)
        self.layers = [ConformerLayer(config) for _ in range(config.num_hidden_layers)]
        self.scale_input = config.scale_input

    def pre_encode(self, audio_signal, length):
        return self.subsampling(audio_signal, length)

    def encode(self, embeddings, lengths):
        x = embeddings
        if self.scale_input:
            x = x * (self.config.hidden_size**0.5)
        T = x.shape[1]
        pos_emb = jnp.asarray(_rel_pos_emb(T, self.config.hidden_size))
        mask = (jnp.arange(T)[None, None, None, :] >= lengths[:, None, None, None])
        for layer in self.layers:
            x = layer(x, pos_emb, mask)
        return x, lengths

    def __call__(self, audio_signal, length):
        x, lengths = self.pre_encode(audio_signal, length)
        return self.encode(x, lengths)


class TransformerAttention(Module):
    def __init__(self, config: TFEncoderConfig):
        d = config.d_model
        self.q_proj = Linear(d, d, bias=True)
        self.k_proj = Linear(d, d, bias=config.k_proj_bias)
        self.v_proj = Linear(d, d, bias=True)
        self.out_proj = Linear(d, d, bias=True)
        self.num_heads = config.encoder_attention_heads
        self.head_dim = d // self.num_heads

    def __call__(self, x, mask=None):
        from ....ops.attention import scaled_dot_product_attention

        B, T, D = x.shape
        q = jnp.transpose(self.q_proj(x).reshape(B, T, self.num_heads, self.head_dim), (0, 2, 1, 3))
        k = jnp.transpose(self.k_proj(x).reshape(B, T, self.num_heads, self.head_dim), (0, 2, 1, 3))
        v = jnp.transpose(self.v_proj(x).reshape(B, T, self.num_heads, self.head_dim), (0, 2, 1, 3))
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        return self.out_proj(jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, D))


class TransformerEncoderLayer(Module):
    def __init__(self, config: TFEncoderConfig):
        self.self_attn = TransformerAttention(config)
        self.self_attn_layer_norm = LayerNorm(config.d_model, eps=config.layer_norm_eps)
        self.fc1 = Linear(config.d_model, config.encoder_ffn_dim)
        self.fc2 = Linear(config.encoder_ffn_dim, config.d_model)
        self.final_layer_norm = LayerNorm(config.d_model, eps=config.layer_norm_eps)

    def __call__(self, x, mask=None):
        x = self.self_attn_layer_norm(x + self.self_attn(x, mask))
        x = self.final_layer_norm(x + self.fc2(jax.nn.relu(self.fc1(x))))
        return x


class TransformerEncoder(Module):
    def __init__(self, config: TFEncoderConfig):
        self.embed_positions = Embedding(config.max_source_positions, config.d_model)
        self.layers = [TransformerEncoderLayer(config) for _ in range(config.encoder_layers)]

    def __call__(self, encoder_states, encoder_mask=None):
        T = encoder_states.shape[1]
        x = encoder_states + self.embed_positions.weight[:T]
        mask = None
        if encoder_mask is not None:
            mask = (~encoder_mask)[:, None, None, :].astype(x.dtype) * -1e4
        for layer in self.layers:
            x = layer(x, mask)
        return x


class SortformerModules(Module):
    def __init__(self, config: ModulesConfig):
        self.encoder_proj = Linear(config.fc_d_model, config.tf_d_model)
        self.first_hidden_to_hidden = Linear(config.tf_d_model, config.tf_d_model)
        self.single_hidden_to_spks = Linear(config.tf_d_model, config.num_speakers)
        self.hidden_to_spks = Linear(2 * config.tf_d_model, config.num_speakers)
        self.n_spk = config.num_speakers

    def forward_speaker_sigmoids(self, hidden_out):
        h = jax.nn.relu(hidden_out)
        h = jax.nn.relu(self.first_hidden_to_hidden(h))
        return jax.nn.sigmoid(self.single_hidden_to_spks(h))


@dataclass
class DiarizationSegment:
    start: float
    end: float
    speaker: int


@dataclass
class DiarizationOutput:
    segments: List[DiarizationSegment]
    speaker_probs: Optional[np.ndarray] = None
    num_speakers: int = 0
    total_time: float = 0.0
    state: Optional["StreamingState"] = None

    @property
    def text(self) -> str:
        return "\n".join(
            f"SPEAKER audio 1 {s.start:.3f} {s.end - s.start:.3f} <NA> <NA> "
            f"speaker_{s.speaker} <NA> <NA>"
            for s in self.segments
        )


@dataclass
class StreamingState:
    spkcache: np.ndarray
    spkcache_preds: np.ndarray
    fifo: np.ndarray
    fifo_preds: np.ndarray
    frames_processed: int

    @property
    def spkcache_len(self) -> int:
        return self.spkcache.shape[1]

    @property
    def fifo_len(self) -> int:
        return self.fifo.shape[1]


BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n):
    for b in BUCKETS:
        if n <= b:
            return b
    return ((n + 1023) // 1024) * 1024


@jax.jit
def _forward(model: "Model", features, lengths):
    emb, emb_len = model.fc_encoder(features, lengths)
    emb = model.sortformer_modules.encoder_proj(emb)
    T = emb.shape[1]
    mask = jnp.arange(T)[None, :] < emb_len[:, None]
    trans = model.tf_encoder(emb, mask)
    preds = model.sortformer_modules.forward_speaker_sigmoids(trans)
    return preds * mask[:, :, None], emb_len


@jax.jit
def _pre_encode(model: "Model", features, lengths):
    return model.fc_encoder.pre_encode(features, lengths)


@jax.jit
def _encode_embs(model: "Model", embs, lengths):
    fc_out, _ = model.fc_encoder.encode(embs, lengths)
    h = model.sortformer_modules.encoder_proj(fc_out)
    T = h.shape[1]
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    trans = model.tf_encoder(h, mask)
    preds = model.sortformer_modules.forward_speaker_sigmoids(trans)
    return preds * mask[:, :, None]


class Model(Module):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.fc_encoder = FastConformerEncoder(config.fc_encoder_config)
        self.tf_encoder = TransformerEncoder(config.tf_encoder_config)
        self.sortformer_modules = SortformerModules(config.modules_config)

    def __call__(self, audio_signal, audio_signal_length):
        preds, _ = _forward(self, audio_signal, audio_signal_length)
        return preds

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent offline diarizations whose mel
        features share a length bucket run as ONE batched `_forward`
        (per-row true lengths ride the lengths vector, so batched ==
        sequential)."""
        from ....serving import StackBatcher

        def run_batch(items):
            feats = jnp.stack([jnp.asarray(f) for f, _t in items])
            lens = jnp.asarray([t for _f, t in items], jnp.int32)
            preds, emb_len = _forward(self, feats, lens)
            preds, emb_len = jax.device_get((preds, emb_len))
            return [np.asarray(p)[: int(n)]
                    for p, n in zip(preds, emb_len)]

        return StackBatcher(self, run_batch, **kwargs)

    # ---- offline ----

    def generate(self, audio, *, sample_rate: int = 16000, threshold: float = 0.5,
                 min_duration: float = 0.0, merge_gap: float = 0.0,
                 verbose: bool = False) -> DiarizationOutput:
        t0 = time.time()
        proc = self.config.processor_config
        waveform = self._load_audio(audio, proc.sampling_rate)
        waveform = waveform / (np.abs(waveform).max() + 1e-3)
        features = extract_mel_features(
            waveform, sample_rate=proc.sampling_rate, n_fft=proc.n_fft,
            hop_length=proc.hop_length, win_length=proc.win_length,
            n_mels=proc.feature_size, preemphasis_coeff=proc.preemphasis,
        )
        T = features.shape[2]
        Tpad = _bucket(T)
        features = jnp.pad(features, [(0, 0), (0, 0), (0, Tpad - T)])
        # under a running server a StackBatcher may be installed:
        # concurrent same-bucket diarizations fuse into one forward
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            preds = np.asarray(hook(np.asarray(features[0]), T))
        else:
            preds, emb_len = _forward(self, features,
                                      jnp.asarray([T], jnp.int32))
            preds, emb_len = jax.device_get((preds, emb_len))
            preds = np.asarray(preds)[0][: int(emb_len[0])]

        sub = self.config.fc_encoder_config.subsampling_factor
        frame_duration = proc.hop_length * sub / proc.sampling_rate
        segments = self._preds_to_segments(
            preds, frame_duration, threshold, min_duration, merge_gap
        )
        active = {s.speaker for s in segments}
        return DiarizationOutput(
            segments=segments, speaker_probs=preds, num_speakers=len(active),
            total_time=time.time() - t0,
        )

    # ---- streaming (spkcache + FIFO, reference :926) ----

    def init_streaming_state(self) -> StreamingState:
        d = self.config.fc_encoder_config.hidden_size
        k = self.config.modules_config.num_speakers
        return StreamingState(
            spkcache=np.zeros((1, 0, d), np.float32),
            spkcache_preds=np.zeros((1, 0, k), np.float32),
            fifo=np.zeros((1, 0, d), np.float32),
            fifo_preds=np.zeros((1, 0, k), np.float32),
            frames_processed=0,
        )

    def streaming_step(self, chunk_features, chunk_length, state: StreamingState,
                       spkcache_max: int = 188, fifo_max: int = 188):
        chunk_embs, lens = _pre_encode(
            self, jnp.asarray(chunk_features), jnp.asarray(chunk_length)
        )
        n = int(jax.device_get(lens)[0])
        chunk_embs = np.asarray(jax.device_get(chunk_embs))[:, :n]

        parts = [p for p in (state.spkcache, state.fifo, chunk_embs) if p.shape[1]]
        all_embs = np.concatenate(parts, axis=1)
        total = all_embs.shape[1]
        Tpad = _bucket(total)
        padded = np.zeros((1, Tpad, all_embs.shape[2]), np.float32)
        padded[:, :total] = all_embs
        preds = np.asarray(
            jax.device_get(
                _encode_embs(self, jnp.asarray(padded), jnp.asarray([total], jnp.int32))
            )
        )[:, :total]

        cs = state.spkcache_len
        fs = state.fifo_len
        chunk_preds = preds[:, cs + fs : cs + fs + n]
        new_fifo = np.concatenate([state.fifo, chunk_embs], axis=1)
        new_fifo_preds = np.concatenate(
            [preds[:, cs : cs + fs], chunk_preds], axis=1
        )
        spkcache, spkcache_preds = state.spkcache, preds[:, :cs] if cs else state.spkcache_preds

        # roll FIFO overflow into the speaker cache; compress cache when full
        if new_fifo.shape[1] > fifo_max:
            overflow = new_fifo.shape[1] - fifo_max
            spkcache = np.concatenate([spkcache, new_fifo[:, :overflow]], axis=1)
            spkcache_preds = np.concatenate(
                [spkcache_preds, new_fifo_preds[:, :overflow]], axis=1
            )
            new_fifo = new_fifo[:, overflow:]
            new_fifo_preds = new_fifo_preds[:, overflow:]
        if spkcache.shape[1] > spkcache_max:
            spkcache, spkcache_preds = self._compress_spkcache(
                spkcache, spkcache_preds, spkcache_max
            )

        new_state = StreamingState(
            spkcache=spkcache, spkcache_preds=spkcache_preds, fifo=new_fifo,
            fifo_preds=new_fifo_preds,
            frames_processed=state.frames_processed + n,
        )
        return chunk_preds[0], new_state

    @staticmethod
    def _compress_spkcache(embs, preds, target_len):
        """Keep the most informative frames (reference `_compress_spkcache_simple`
        :1827: highest total log speaker activity, order preserved)."""
        scores = np.log(np.clip(preds[0], 1e-7, 1.0)).sum(axis=-1)
        top = np.sort(np.argsort(-scores)[:target_len])
        return embs[:, top], preds[:, top]

    def feed(self, chunk, state: StreamingState, *,
             sample_rate: int = 16000, threshold: float = 0.5,
             min_duration: float = 0.0, merge_gap: float = 0.0,
             spkcache_max: int = 188, fifo_max: int = 188):
        """Feed one incrementally-arriving audio chunk (mic streaming) and
        return ``(DiarizationOutput, new_state)`` with segment times offset
        by the audio already processed (reference sortformer.py:1313-1419).

        Use :meth:`init_streaming_state` for the initial state."""
        proc = self.config.processor_config
        sub = self.config.fc_encoder_config.subsampling_factor
        frame_duration = proc.hop_length * sub / proc.sampling_rate

        wav = np.asarray(chunk, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        if sample_rate != proc.sampling_rate:
            from ....utils import resample_audio

            wav = resample_audio(wav, sample_rate, proc.sampling_rate)
        offset = state.frames_processed * frame_duration
        wav = wav / (np.abs(wav).max() + 1e-3)

        feats = extract_mel_features(
            wav, sample_rate=proc.sampling_rate, n_fft=proc.n_fft,
            hop_length=proc.hop_length, win_length=proc.win_length,
            n_mels=proc.feature_size, preemphasis_coeff=proc.preemphasis,
        )
        chunk_preds, state = self.streaming_step(
            feats, np.asarray([feats.shape[2]], np.int32), state,
            spkcache_max=spkcache_max, fifo_max=fifo_max,
        )
        segments = [
            DiarizationSegment(start=s.start + offset, end=s.end + offset,
                               speaker=s.speaker)
            for s in self._preds_to_segments(
                chunk_preds, frame_duration, threshold, min_duration,
                merge_gap)
        ]
        out = DiarizationOutput(
            segments=segments, speaker_probs=chunk_preds,
            num_speakers=len({s.speaker for s in segments}), state=state,
        )
        return out, state

    def generate_stream(self, audio, *, state: Optional[StreamingState] = None,
                        sample_rate: int = 16000, chunk_duration: float = 5.0,
                        threshold: float = 0.5, min_duration: float = 0.0,
                        merge_gap: float = 0.0, spkcache_max: int = 188,
                        fifo_max: int = 188, verbose: bool = False):
        proc = self.config.processor_config
        waveform = self._load_audio(audio, proc.sampling_rate)
        waveform = waveform / (np.abs(waveform).max() + 1e-3)
        chunk_samples = int(chunk_duration * proc.sampling_rate)
        if state is None:
            state = self.init_streaming_state()
        sub = self.config.fc_encoder_config.subsampling_factor
        frame_duration = proc.hop_length * sub / proc.sampling_rate

        all_preds = []
        for pos in range(0, len(waveform), chunk_samples):
            seg = waveform[pos : pos + chunk_samples]
            if len(seg) < proc.n_fft:
                break
            feats = extract_mel_features(
                seg, sample_rate=proc.sampling_rate, n_fft=proc.n_fft,
                hop_length=proc.hop_length, win_length=proc.win_length,
                n_mels=proc.feature_size, preemphasis_coeff=proc.preemphasis,
            )
            chunk_preds, state = self.streaming_step(
                feats, np.asarray([feats.shape[2]], np.int32), state,
                spkcache_max=spkcache_max, fifo_max=fifo_max,
            )
            all_preds.append(chunk_preds)
            preds = np.concatenate(all_preds, axis=0)
            segments = self._preds_to_segments(
                preds, frame_duration, threshold, min_duration, merge_gap
            )
            yield DiarizationOutput(
                segments=segments, speaker_probs=preds,
                num_speakers=len({s.speaker for s in segments}), state=state,
            )

    # ---- helpers ----

    @staticmethod
    def _load_audio(audio, sample_rate) -> np.ndarray:
        if isinstance(audio, str):
            from ...utils import load_model  # noqa: F401  (avoid cycle)
            from ....utils import load_audio

            return load_audio(audio, sample_rate=sample_rate)
        return np.asarray(audio, np.float32).reshape(-1)

    @staticmethod
    def _preds_to_segments(preds: np.ndarray, frame_duration: float,
                           threshold: float, min_duration: float,
                           merge_gap: float) -> List[DiarizationSegment]:
        segments = []
        T, K = preds.shape
        for spk in range(K):
            active = preds[:, spk] > threshold
            start = None
            for t in range(T + 1):
                on = t < T and active[t]
                if on and start is None:
                    start = t
                elif not on and start is not None:
                    seg = DiarizationSegment(
                        start * frame_duration, t * frame_duration, spk
                    )
                    if merge_gap > 0 and segments and segments[-1].speaker == spk and \
                            seg.start - segments[-1].end <= merge_gap:
                        segments[-1] = DiarizationSegment(
                            segments[-1].start, seg.end, spk
                        )
                    elif seg.end - seg.start >= min_duration:
                        segments.append(seg)
                    start = None
        segments.sort(key=lambda s: (s.start, s.speaker))
        return segments

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for k, v in weights.items():
            if k.endswith("pos_bias_u"):
                k = k.replace("pos_bias_u", "bias_u")
            if k.endswith("pos_bias_v"):
                k = k.replace("pos_bias_v", "bias_v")
            out[k] = v
        return orient_weights_to_model(self, out)
