"""SAM-Audio: text/anchor-prompted source separation over DACVAE latents.

TPU-native re-implementation of the reference
mlx_audio/sts/models/sam_audio/model.py:60-1175 and processor.py:189-400.
The reference steps the ODE from Python with an mx.eval per step; here the
ENTIRE flow-matching integration (euler or midpoint, every DiT call) runs
as one jitted `lax.fori_loop` program per audio-length bucket — zero host
round-trips between steps. Long audio reuses the same program per chunk
with cosine crossfade.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Generator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.dacvae.dacvae import DACVAE
from ....nn import layers as nn
from ....nn.module import Module
from .config import SAMAudioConfig
from .text_encoder import T5TextEncoder
from .transformer import DiT

__all__ = ["SAMAudio", "SeparationResult", "SAMAudioProcessor",
           "AlignModalities", "EmbedAnchors"]

DFLT_ODE_OPT = {"method": "midpoint", "step_size": 2 / 32}
ANCHOR_DICT = {"<null>": 0, "+": 1, "-": 2, "<pad>": 3}


class AlignModalities(Module):
    """Gated 1×1-conv modality alignment (reference align.py:9-64)."""

    def __init__(self, in_channels: int, out_channels: int,
                 normalize: bool = True, with_gate: bool = True):
        self.conv_weight = jnp.zeros((out_channels, 1, in_channels))
        self.conv_bias = jnp.zeros((out_channels,))
        if normalize:
            self.layer_norm = nn.LayerNorm(out_channels)
        if with_gate:
            self.gate = jnp.zeros((1,))

    def __call__(self, anchor: jnp.ndarray,
                 tgt: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if tgt is None:
            return anchor
        post = jnp.einsum("btc,oc->bto", tgt, self.conv_weight[:, 0, :]) \
            + self.conv_bias
        if hasattr(self, "layer_norm"):
            post = self.layer_norm(post)
        if not hasattr(self, "gate"):
            return post
        return anchor + jnp.tanh(self.gate) * post


class EmbedAnchors(Module):
    """Temporal anchor embedding (reference align.py:67-123)."""

    def __init__(self, num_embeddings: int, embedding_dim: int,
                 out_dim: int):
        self.embed = nn.Embedding(num_embeddings + 1, embedding_dim)
        self.gate = jnp.zeros((1,))
        self.proj = nn.Linear(embedding_dim, out_dim, bias=False)

    def __call__(self, x: jnp.ndarray,
                 anchor_ids: Optional[jnp.ndarray] = None,
                 anchor_alignment: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        if anchor_ids is None or anchor_alignment is None:
            return x
        gathered = jnp.take_along_axis(anchor_ids, anchor_alignment,
                                       axis=1)
        proj = self.proj(self.embed(gathered))
        return x + jnp.tanh(self.gate) * proj


def sinusoidal_embedding(t: jnp.ndarray, dim: int,
                         max_period: float = 10000.0) -> jnp.ndarray:
    """(B,) → (B, dim) (reference model.py:68-90)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


@dataclass
class SeparationResult:
    """reference model.py:92-117."""

    target: List[np.ndarray]
    residual: List[np.ndarray]
    noise: Optional[Any] = None
    peak_memory: float = 0.0


@dataclass
class StreamingChunk:
    target: np.ndarray
    residual: np.ndarray
    chunk_idx: int
    is_last: bool
    peak_memory: float = 0.0


@dataclass
class Batch:
    """reference processor.py:163-186."""

    audios: Any = None
    sizes: Any = None
    wav_sizes: Any = None
    descriptions: Any = None
    anchor_ids: Any = None
    anchor_alignment: Any = None
    audio_pad_mask: Any = None


class SAMAudioProcessor:
    """Anchor/audio batching (reference processor.py:189-400)."""

    ANCHOR_DICT = ANCHOR_DICT

    def __init__(self, audio_hop_length: int,
                 audio_sampling_rate: int = 48_000):
        self.audio_hop_length = audio_hop_length
        self.audio_sampling_rate = audio_sampling_rate

    def wav_to_feature_idx(self, wav_idx: int) -> int:
        return math.ceil(wav_idx / self.audio_hop_length)

    def feature_to_wav_idx(self, feature_idx: int) -> int:
        return feature_idx * self.audio_hop_length

    def process_anchors(self, anchors, audio_pad_mask: np.ndarray,
                        batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        seq_len = audio_pad_mask.shape[1]
        align = np.zeros((batch_size, seq_len), np.int32)
        align[~np.asarray(audio_pad_mask, bool)] = 1
        if anchors is None:
            ids = np.tile(np.array([[ANCHOR_DICT["<null>"],
                                     ANCHOR_DICT["<pad>"]]], np.int32),
                          (batch_size, 1))
            return ids, align
        all_ids = []
        for i, anchor_list in enumerate(anchors):
            current = [ANCHOR_DICT["<null>"], ANCHOR_DICT["<pad>"]]
            for token, start_t, end_t in anchor_list:
                s = self.wav_to_feature_idx(
                    int(start_t * self.audio_sampling_rate))
                e = self.wav_to_feature_idx(
                    int(end_t * self.audio_sampling_rate))
                align[i, s: min(e, seq_len)] = len(current)
                current.append(ANCHOR_DICT.get(token, 0))
            all_ids.append(current)
        width = max(len(ids) for ids in all_ids)
        ids = np.asarray([ids + [ANCHOR_DICT["<pad>"]] * (width - len(ids))
                          for ids in all_ids], np.int32)
        return ids, align

    def __call__(self, descriptions: List[str], audios: List[np.ndarray],
                 anchors=None) -> Batch:
        arrs = [np.asarray(a, np.float32).reshape(-1) for a in audios]
        wav_sizes = np.asarray([len(a) for a in arrs])
        T = int(wav_sizes.max())
        batched = np.zeros((len(arrs), T, 1), np.float32)
        for i, a in enumerate(arrs):
            batched[i, : len(a), 0] = a
        sizes = np.asarray([self.wav_to_feature_idx(int(n))
                            for n in wav_sizes], np.int32)
        seq = int(sizes.max())
        pad_mask = np.arange(seq)[None, :] < sizes[:, None]
        ids, align = self.process_anchors(anchors, pad_mask, len(arrs))
        return Batch(audios=batched, sizes=sizes, wav_sizes=wav_sizes,
                     descriptions=descriptions, anchor_ids=ids,
                     anchor_alignment=align, audio_pad_mask=pad_mask)


# ---------------------------------------------------------------- ODE
@partial(jax.jit, static_argnames=("num_steps", "method"))
def _ode_solve(model, noise, audio_features, text_features, text_mask,
               anchor_ids, anchor_alignment, audio_pad_mask,
               num_steps: int, method: str):
    """Full flow-matching integration in one program
    (reference model.py:664-707 loop + _ode_step_* 370-434)."""
    dt = 1.0 / num_steps
    B = noise.shape[0]

    def velocity(x, t):
        time_t = jnp.full((B,), t, jnp.float32)
        return model(noisy_audio=x, audio_features=audio_features,
                     text_features=text_features, time=time_t,
                     text_mask=text_mask, anchor_ids=anchor_ids,
                     anchor_alignment=anchor_alignment,
                     audio_pad_mask=audio_pad_mask)

    def body(i, x):
        t = i * dt
        if method == "euler":
            return x + dt * velocity(x, t)
        v_mid = velocity(x + 0.5 * dt * velocity(x, t), t + 0.5 * dt)
        return x + dt * v_mid

    return jax.lax.fori_loop(0, num_steps, body, noise)


class SAMAudio(Module):
    """SAM-Audio (reference model.py:119-1175)."""

    def __init__(self, config: Optional[SAMAudioConfig] = None):
        self.config = config or SAMAudioConfig()
        config = self.config
        self.audio_codec = DACVAE(config.audio_codec)
        self.text_encoder = T5TextEncoder(config.text_encoder)
        self.transformer = DiT(config.transformer)
        self.proj = nn.Linear(config.in_channels, config.transformer.dim)
        self.embed_anchors = EmbedAnchors(config.num_anchors,
                                          config.anchor_embedding_dim,
                                          config.transformer.dim)
        self.memory_proj = nn.Linear(config.text_encoder.dim,
                                     config.transformer.dim)
        self._timestep_dim = config.transformer.dim

    @property
    def sample_rate(self) -> int:
        return self.audio_codec.sample_rate

    @property
    def processor(self) -> SAMAudioProcessor:
        return SAMAudioProcessor(self.audio_codec.hop_length,
                                 self.audio_codec.sample_rate)

    # ------------------------------------------------------------------
    def align_inputs(self, noisy_audio, audio_features, anchor_ids=None,
                     anchor_alignment=None):
        """[noisy, zeros, features] concat + anchors
        (reference model.py:263-301)."""
        x = jnp.concatenate([noisy_audio, jnp.zeros_like(audio_features),
                             audio_features], axis=2)
        return self.embed_anchors(self.proj(x), anchor_ids,
                                  anchor_alignment)

    def __call__(self, noisy_audio, audio_features, text_features, time,
                 text_mask=None, anchor_ids=None, anchor_alignment=None,
                 audio_pad_mask=None):
        """One velocity-field evaluation (reference model.py:303-357)."""
        aligned = self.align_inputs(noisy_audio, audio_features,
                                    anchor_ids, anchor_alignment)
        temb = sinusoidal_embedding(time, self._timestep_dim
                                    )[:, None].astype(aligned.dtype)
        memory = (self.memory_proj(text_features.astype(aligned.dtype))
                  + temb if text_features is not None else temb)
        return self.transformer(aligned, time,
                                padding_mask=audio_pad_mask,
                                memory=memory,
                                memory_padding_mask=text_mask)

    def _get_audio_features(self, audios: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 1) → (B, F, 2·C) (reference model.py:359-367)."""
        feats = self.audio_codec.encode(audios)  # (B, C, F)
        feats = jnp.swapaxes(feats, 1, 2)
        return jnp.concatenate([feats, feats], axis=2)

    # ------------------------------------------------------------------
    def separate(self, audios, descriptions: List[str],
                 sizes=None, anchors=None, anchor_ids=None,
                 anchor_alignment=None, audio_pad_mask=None, noise=None,
                 ode_opt: Optional[Dict[str, Any]] = None,
                 ode_decode_chunk_size: Optional[int] = None,
                 key: Optional[jax.Array] = None,
                 _text_features=None, _text_mask=None,
                 noise_keys: Optional[List] = None, _direct: bool = False
                 ) -> SeparationResult:
        """Text-prompted separation (reference model.py:436-589).

        ``noise_keys``: optional per-row PRNG keys — each row's noise is
        drawn as its own (1, F, 2C) sample, so a row's result is identical
        whether it runs alone or stacked with co-tenants (the serving
        batcher's equality contract)."""
        # under a running server a SAMBatcher may be installed: concurrent
        # single-item separations of equal length fuse into one ODE batch
        if not _direct and noise is None and anchors is None:
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            if (hook is not None and isinstance(audios, (list, tuple))
                    and len(audios) == 1
                    and np.asarray(audios[0]).ndim <= 1):
                return hook(np.asarray(audios[0], np.float32),
                            descriptions[0])
        if isinstance(audios, (list, tuple)) and audios and \
                not np.isscalar(audios[0]) and np.asarray(audios[0]).ndim <= 1:
            batch = self.processor(descriptions, list(audios),
                                   anchors=anchors)
            audios = batch.audios
            sizes = batch.sizes
            anchor_ids = batch.anchor_ids
            anchor_alignment = batch.anchor_alignment
            audio_pad_mask = batch.audio_pad_mask

        ode_opt = ode_opt or DFLT_ODE_OPT
        step_size = ode_opt.get("step_size", 2 / 32)
        if not (0 < step_size < 1):
            raise ValueError(
                f"Step size {step_size} must be in (0, 1) — e.g. 2/32 for "
                "16 steps")
        method = ode_opt.get("method", "midpoint")
        num_steps = int(1.0 / step_size)

        audios = jnp.asarray(audios, jnp.float32)
        if audios.ndim == 2:
            audios = audios[:, :, None]
        audio_features = self._get_audio_features(audios)
        B, seq_len, _ = audio_features.shape
        if sizes is None:
            sizes = np.full((B,), seq_len, np.int32)

        def _fit(arr, fill):
            """Trim/pad time-major host arrays to the actual feature length
            (the codec's edge padding can differ by a frame)."""
            if arr is None:
                return None
            arr = np.asarray(arr)
            if arr.shape[1] >= seq_len:
                return arr[:, :seq_len]
            pad = np.full((arr.shape[0], seq_len - arr.shape[1]), fill,
                          arr.dtype)
            return np.concatenate([arr, pad], axis=1)

        anchor_alignment = _fit(anchor_alignment, 1)
        audio_pad_mask = _fit(audio_pad_mask, False)

        if _text_features is not None:
            text_features, text_mask = _text_features, _text_mask
        else:
            text_features, text_mask = self.text_encoder(descriptions)

        channels = audio_features.shape[2] // 2
        if noise is None and noise_keys is not None:
            # per-row noise streams: row b depends only on its own key,
            # so batched rows equal solo runs with the same key
            noise = jnp.concatenate([
                jax.random.normal(
                    k, (1, seq_len, audio_features.shape[2]),
                    audio_features.dtype)
                for k in noise_keys])
        if noise is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            # noise in the model dtype (reference model.py:518: self.dtype)
            # — an fp32 noise would upcast the whole ODE loop
            noise = jax.random.normal(key, audio_features.shape,
                                      audio_features.dtype)

        gen = _ode_solve(
            self, jnp.asarray(noise), audio_features,
            text_features, None if text_mask is None else
            jnp.asarray(text_mask),
            None if anchor_ids is None else jnp.asarray(anchor_ids),
            None if anchor_alignment is None else
            jnp.asarray(anchor_alignment),
            None if audio_pad_mask is None else jnp.asarray(audio_pad_mask),
            num_steps, method)
        # sync before the decoder programs: the large ODE program and the
        # decode programs must not hold device workspaces concurrently
        jax.block_until_ready(gen)

        target = jnp.swapaxes(gen[:, :, :channels], 1, 2)  # (B, C, F)
        residual = jnp.swapaxes(gen[:, :, channels:], 1, 2)
        from ....utils import fetch_array

        target_wavs = fetch_array(self.audio_codec.decode(
            target, chunk_size=ode_decode_chunk_size))
        residual_wavs = fetch_array(self.audio_codec.decode(
            residual, chunk_size=ode_decode_chunk_size))

        hop = self.audio_codec.hop_length
        wav_sizes = [int(s) * hop for s in np.asarray(sizes)]
        return SeparationResult(
            target=[target_wavs[b, : wav_sizes[b]] for b in range(B)],
            residual=[residual_wavs[b, : wav_sizes[b]] for b in range(B)],
            noise=np.asarray(noise))

    # ------------------------------------------------------------------
    def _chunks(self, audios: jnp.ndarray, chunk_seconds: float,
                overlap_seconds: float):
        sr = self.sample_rate
        chunk = int(chunk_seconds * sr)
        overlap = int(overlap_seconds * sr)
        hop = chunk - overlap
        total = audios.shape[2] if audios.ndim == 3 else audios.shape[1]
        n = max(1, math.ceil(max(total - overlap, 1) / hop))
        return chunk, overlap, hop, total, n

    def separate_long(self, audios, descriptions: List[str],
                      chunk_seconds: float = 10.0,
                      overlap_seconds: float = 3.0,
                      ode_opt: Optional[Dict[str, Any]] = None,
                      seed: int = 42, **kwargs) -> SeparationResult:
        """Chunked separation with cosine crossfade
        (reference model.py:589-772)."""
        target_parts, residual_parts = [], []
        for chunk in self.separate_streaming(
                audios, descriptions, chunk_seconds=chunk_seconds,
                overlap_seconds=overlap_seconds, ode_opt=ode_opt,
                seed=seed, **kwargs):
            target_parts.append(chunk.target)
            residual_parts.append(chunk.residual)
        return SeparationResult(
            target=[np.concatenate(target_parts, axis=0)],
            residual=[np.concatenate(residual_parts, axis=0)])

    def separate_streaming(self, audios, descriptions: List[str],
                           target_callback=None,
                           residual_callback=None,
                           chunk_seconds: float = 10.0,
                           overlap_seconds: float = 3.0,
                           anchor_ids=None,
                           anchor_alignment=None,
                           ode_opt: Optional[Dict[str, Any]] = None,
                           seed: int = 42,
                           verbose: bool = False,
                           ode_decode_chunk_size: Optional[int] = None,
                           _text_features=None, _text_mask=None):
        """Stream chunk results ASAP with crossfaded overlaps
        (reference model.py:774-1175).

        Generator mode (no callbacks): yields StreamingChunk objects.
        Callback mode (reference model.py:884-898): calls
        ``target_callback(audio, chunk_idx, is_last)`` (and the residual
        callback, when given) per chunk and returns the total number of
        target samples written.
        """
        gen = self._separate_streaming_generator(
            audios, descriptions, chunk_seconds=chunk_seconds,
            overlap_seconds=overlap_seconds, anchor_ids=anchor_ids,
            anchor_alignment=anchor_alignment, ode_opt=ode_opt, seed=seed,
            verbose=verbose, ode_decode_chunk_size=ode_decode_chunk_size,
            _text_features=_text_features, _text_mask=_text_mask)
        if target_callback is None:
            return gen
        total_written = 0
        for chunk in gen:
            target_callback(chunk.target, chunk.chunk_idx, chunk.is_last)
            total_written += int(np.asarray(chunk.target).shape[0])
            if residual_callback is not None:
                residual_callback(chunk.residual, chunk.chunk_idx,
                                  chunk.is_last)
        return total_written

    def _separate_streaming_generator(
            self, audios, descriptions: List[str],
            chunk_seconds: float = 10.0,
            overlap_seconds: float = 3.0,
            anchor_ids=None, anchor_alignment=None,
            ode_opt: Optional[Dict[str, Any]] = None,
            seed: int = 42, verbose: bool = False,
            ode_decode_chunk_size: Optional[int] = None,
            _text_features=None, _text_mask=None
    ) -> Generator[StreamingChunk, None, None]:
        audios = jnp.asarray(np.asarray(audios, np.float32))
        if audios.ndim == 1:
            audios = audios[None, None, :]
        elif audios.ndim == 2:
            audios = audios[:, None, :]
        if audios.shape[0] != 1:
            raise ValueError("streaming supports batch_size=1 only")
        chunk, overlap, hop, total, n = self._chunks(
            audios, chunk_seconds, overlap_seconds)

        if verbose:
            print("Encoding text prompt...")
        if _text_features is not None:
            text_features, text_mask = _text_features, _text_mask
        else:
            text_features, text_mask = self.text_encoder(descriptions)
        if verbose:
            print(f"Processing {total / self.sample_rate:.1f}s audio in "
                  f"{n} chunks ({chunk_seconds}s each)...")

        prev_target_tail = prev_residual_tail = None
        for i in range(n):
            start = i * hop
            end = min(start + chunk, total)
            piece = jnp.swapaxes(audios[:, :, start:end], 1, 2)  # (1,T,1)
            # anchors are passed whole, as the reference does
            # (model.py:954-959): separate() trims the alignment to the
            # chunk's feature length
            result = self.separate(
                piece, descriptions, anchor_ids=anchor_ids,
                anchor_alignment=anchor_alignment, ode_opt=ode_opt,
                key=jax.random.PRNGKey(seed + i),
                ode_decode_chunk_size=ode_decode_chunk_size,
                _text_features=text_features, _text_mask=text_mask)
            if verbose:
                print(f"chunk {i + 1}/{n} done")
            tgt = np.asarray(result.target[0])
            res = np.asarray(result.residual[0])
            is_last = i == n - 1

            if i > 0 and overlap > 0:
                k = min(overlap, len(tgt), len(prev_target_tail))
                t = np.linspace(0, 1, k)[:, None]
                fade_in = 0.5 * (1 - np.cos(math.pi * t))
                fade_out = 1 - fade_in
                blended_t = prev_target_tail[:k] * fade_out \
                    + tgt[:k] * fade_in
                blended_r = prev_residual_tail[:k] * fade_out \
                    + res[:k] * fade_in
                tgt = np.concatenate([blended_t, tgt[k:]], axis=0)
                res = np.concatenate([blended_r, res[k:]], axis=0)

            if not is_last and overlap > 0 and len(tgt) > overlap:
                prev_target_tail = tgt[-overlap:]
                prev_residual_tail = res[-overlap:]
                yield StreamingChunk(tgt[:-overlap], res[:-overlap], i,
                                     False)
            else:
                yield StreamingChunk(tgt, res, i, True)
                return

    # ------------------------------------------------------------------
    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent single-item `separate` calls of
        equal audio length fuse into ONE batched ODE + codec decode
        (rows are independent; per-row noise keys keep batched == solo)."""
        return SAMBatcher(self, **kwargs)

    def sanitize(self, weights: dict) -> dict:
        """Drop ranker/span heads, combine LSTM biases, orient convs
        (reference model.py:206-260)."""
        import re

        from ....nn.sanitize import orient_weights_to_model

        drop_prefixes = ("text_encoder.", "span_predictor.",
                         "visual_ranker.", "text_ranker.",
                         "vision_encoder.", "align_masked_video.")
        out = {}
        for key, value in weights.items():
            if key.startswith(drop_prefixes) or "wm_rates" in key:
                continue
            k = key
            m = re.search(r"(.*lstm)\.(weight_ih|weight_hh|bias_ih|bias_hh)"
                          r"_l(\d+)$", k)
            if m:
                remap = {"weight_ih": "Wx", "weight_hh": "Wh",
                         "bias_ih": "bias_ih", "bias_hh": "bias_hh"}
                k = f"{m.group(1)}.{m.group(3)}.{remap[m.group(2)]}"
            out[k] = value
        return orient_weights_to_model(self, out)


def save_audio(audio, path: str, sample_rate: int = 48000) -> None:
    """Write a separated stem to disk (reference sam_audio/processor.py:403).

    Accepts (length,) or (length, 1) arrays of any array type; squeezes and
    delegates to the native RIFF writer.
    """
    from ....audio_io import write as audio_write

    audio = np.asarray(audio)
    if audio.ndim > 1:
        audio = audio.squeeze()
    audio_write(path, audio.astype(np.float32), sample_rate)


class SAMBatcher:
    """Cross-request batching for text-prompted separation: concurrent
    `separate([audio], [description])` calls whose audio lengths match
    stack into one multi-row `separate` (one ODE fori_loop + one codec
    decode for the whole group). Each row gets its own PRNG noise key
    (PRNGKey(0), matching the single-request default), so batched results
    are bitwise-equal to running each request alone."""

    def __init__(self, model, max_batch: int = 4, window_ms: float = 10.0):
        from ....serving import BatchScheduler

        self.model = model
        self.sched = BatchScheduler(
            self._run, lambda item: (len(item[0]),), max_batch=max_batch,
            window_ms=window_ms)

    def _run(self, items):
        audios = [it[0] for it in items]
        descs = [it[1] for it in items]
        res = self.model.separate(
            audios, descs,
            noise_keys=[jax.random.PRNGKey(0)] * len(items), _direct=True)
        return [
            SeparationResult(target=[res.target[i]],
                             residual=[res.residual[i]],
                             noise=np.asarray(res.noise)[i:i + 1])
            for i in range(len(items))
        ]

    def __call__(self, audio, description):
        return self.sched((audio, description))

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self.model, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self.model)
        self.sched.close()

    @property
    def dispatch_count(self) -> int:
        return self.sched.dispatch_count
