"""MossFormer2 SE 48K processor: fbank+deltas → mask net → masked iSTFT.

TPU-native re-implementation of the reference
mlx_audio/sts/models/mossformer2_se/model.py:33-427. The per-chunk pipeline
(Kaldi fbank, deltas, 24-block mask net, STFT mask, iSTFT) is one jitted
graph per chunk-length bucket; segmented/chunked long-audio modes reassemble
on the host exactly like the reference.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import compute_deltas_kaldi, compute_fbank_kaldi, istft, stft
from ....nn.module import Module, load_weights
from .config import MossFormer2SEConfig
from .mossformer2 import MossFormer2SE, TestNet

MAX_WAV_VALUE = 32768.0

__all__ = ["MossFormer2SEModel", "Model", "MossFormer2SEConfig"]


def _hamming(size: int) -> jnp.ndarray:
    n = jnp.arange(size)
    return 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / (size - 1))


def _process_chunk_core(model: TestNet, audio: jnp.ndarray, cfg_static):
    """audio: (T,) scaled by MAX_WAV_VALUE → enhanced (T,)."""
    (sample_rate, win_len, win_inc, fft_len, num_mels, win_type,
     preemphasis) = cfg_static
    fb = compute_fbank_kaldi(audio, sample_rate=sample_rate, win_len=win_len,
                             win_inc=win_inc, num_mels=num_mels,
                             win_type=win_type, preemphasis=preemphasis)
    d1 = compute_deltas_kaldi(fb.T, win_length=5)
    d2 = compute_deltas_kaldi(d1, win_length=5)
    feats = jnp.concatenate([fb, d1.T, d2.T], axis=1)[None]  # (1, T', 180)

    mask = model(feats)[-1][0]  # (T', out_final)

    window = _hamming(win_len)
    spec = stft(audio, n_fft=fft_len, hop_length=win_inc, win_length=win_len,
                window=window, center=False)  # (frames, freq)
    frames = min(spec.shape[0], mask.shape[0])
    masked = spec[:frames] * mask[:frames].astype(spec.real.dtype)
    out = istft(masked.T, hop_length=win_inc, win_length=win_len,
                window=window, center=False, length=audio.shape[0])
    return out


_process_chunk_jit = partial(jax.jit, static_argnames=("cfg_static",))(
    _process_chunk_core)


@partial(jax.jit, static_argnames=("cfg_static",))
def _process_batch_jit(model: TestNet, audio_b: jnp.ndarray, cfg_static):
    """Batched variant for serving: (B, T) → (B, T) via vmap — concurrent
    equal-length chunks enhance as ONE device dispatch."""
    return jax.vmap(lambda a: _process_chunk_core(model, a, cfg_static))(
        audio_b)


class MossFormer2SEModel:
    """Enhancement front end (reference model.py:33-427)."""

    def __init__(self, model: TestNet, config: MossFormer2SEConfig):
        self.model = model
        self.config = config

    @property
    def _cfg_static(self):
        c = self.config
        return (c.sample_rate, c.win_len, c.win_inc, c.fft_len, c.num_mels,
                c.win_type, c.preemphasis)

    def _hook(self):
        """Serving hook lookup: the StackBatcher registers on this
        processor; a DPReplicaPool (MLX_AUDIO_TPU_DP) registers on the
        loader-facing wrapper Model, which `Model.enhance` records as
        `_hook_owner` here."""
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is None:
            owner = getattr(self, "_hook_owner", None)
            if owner is not None:
                hook = get_infer_hook(owner)
        return hook

    def _process_chunk(self, audio: np.ndarray) -> np.ndarray:
        # under a running server a StackBatcher may be installed:
        # concurrent equal-length chunks enhance as one vmapped dispatch
        hook = self._hook()
        if hook is not None:
            return np.asarray(hook(np.asarray(audio, np.float32)))
        out = _process_chunk_jit(self.model, jnp.asarray(audio, jnp.float32),
                                 self._cfg_static)
        return np.asarray(out)

    def _process_many(self, segments) -> list:
        """Enhance several equal-or-mixed-length segments. Under an
        installed batcher the segments are submitted CONCURRENTLY, so one
        long request's own windows fuse into vmapped dispatches (as well
        as fusing with co-tenant requests)."""
        hook = self._hook()
        if hook is not None:
            futs = [hook.submit(np.asarray(s, np.float32))
                    for s in segments]
            return [np.asarray(f.result()) for f in futs]
        return [self._process_chunk(s) for s in segments]

    def enhance(self, audio: Union[np.ndarray, jnp.ndarray],
                chunked: Optional[bool] = None) -> np.ndarray:
        """Noisy waveform (T,) at 48 kHz → enhanced waveform (T,)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        duration = audio.shape[0] / self.config.sample_rate
        use_chunked = (chunked if chunked is not None
                       else duration >= self.config.auto_chunk_threshold)
        if use_chunked:
            return self._decode_chunked(audio)
        return self._decode_one_audio(audio)

    # ------------------------------------------------------------------
    def _decode_one_audio(self, audio: np.ndarray) -> np.ndarray:
        """Full / segmented processing (reference model.py:199-280)."""
        cfg = self.config
        original_len = audio.shape[0]
        x = audio * MAX_WAV_VALUE
        limit = cfg.sample_rate * cfg.one_time_decode_length
        if original_len <= limit:
            return self._process_chunk(x) / MAX_WAV_VALUE

        window_size = int(cfg.sample_rate * cfg.decode_window)
        stride = int(window_size * 0.75)
        t = x.shape[0]
        if t < window_size:
            x = np.pad(x, (0, window_size - t))
        elif t < window_size + stride:
            x = np.pad(x, (0, window_size + stride - t))
        elif (t - window_size) % stride != 0:
            x = np.pad(x, (0, stride - (t - window_size) % stride))
        t = x.shape[0]
        give_up = (window_size - stride) // 2
        out = np.zeros(t)
        starts = list(range(0, t - window_size + 1, stride))
        segs = self._process_many(
            [x[i: i + window_size] for i in starts])
        for idx, seg in zip(starts, segs):
            if idx == 0:
                out[idx: idx + window_size - give_up] = seg[:-give_up]
            else:
                out[idx + give_up: idx + window_size - give_up] = \
                    seg[give_up:-give_up]
        return out[:original_len] / MAX_WAV_VALUE

    def _decode_chunked(self, audio: np.ndarray) -> np.ndarray:
        """Chunked with discard-edges reassembly (reference model.py:282-353)."""
        cfg = self.config
        original_len = audio.shape[0]
        x = audio * MAX_WAV_VALUE
        chunk_samples = int(cfg.sample_rate * cfg.chunk_seconds)
        overlap = int(chunk_samples * cfg.chunk_overlap)
        stride = chunk_samples - overlap
        give_up = overlap // 2
        if original_len <= chunk_samples:
            return self._process_chunk(x) / MAX_WAV_VALUE

        starts = list(range(0, original_len - chunk_samples + 1, stride))
        idx = starts[-1] + stride if starts else 0
        segs = [x[i: i + chunk_samples] for i in starts]
        if idx < original_len:
            segs.append(x[idx:])
            starts.append(idx)
        chunks = self._process_many(segs)

        out = np.zeros(original_len)
        for i, (chunk, start) in enumerate(zip(chunks, starts)):
            L = len(chunk)
            first, last = i == 0, i == len(chunks) - 1
            if last and L < chunk_samples:
                ks = give_up if not first else 0
                ke = L
            else:
                ks = 0 if first else give_up
                ke = L - give_up
            s = start + ks
            e = min(start + ke, original_len)
            out[s:e] = chunk[ks: ks + (e - s)]
        return out / MAX_WAV_VALUE


class Model(Module):
    """Loader-facing wrapper (weights key root: model.mossformer.*)."""

    def __init__(self, config=None):
        if isinstance(config, dict):
            config = MossFormer2SEConfig.from_dict(config)
        self.config = config or MossFormer2SEConfig()
        self.net = MossFormer2SE(self.config)
        self.processor = MossFormer2SEModel(self.net.model, self.config)

    def enhance(self, audio=None, chunked: Optional[bool] = None,
                audio_input=None) -> np.ndarray:
        # `audio_input` is the reference's parameter name (model.py:160)
        if audio is None:
            audio = audio_input
        # the processor holds a reference to self.net.model at construction;
        # rebind in case weights were loaded (functional update). Record
        # the wrapper as hook owner so a DPReplicaPool registered on the
        # wrapper is visible from the processor's device-call sites.
        self.processor.model = self.net.model
        self.processor._hook_owner = self
        return self.processor.enhance(audio, chunked=chunked)

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent equal-length enhancement chunks run
        as ONE vmapped device dispatch (`_process_batch_jit`). The hook is
        keyed on the processor (whose `_process_chunk` is the device
        call); it is ALSO registered under this wrapper so server-side
        `unload` (which looks up the wrapper) can tear it down."""
        from ....serving import (StackBatcher, register_infer_hook,
                                 unregister_infer_hook)

        self.processor.model = self.net.model
        proc = self.processor

        def run_batch(items):
            x = jnp.stack([jnp.asarray(a, jnp.float32) for a in items])
            out = _process_batch_jit(proc.model, x, proc._cfg_static)
            return list(np.asarray(jax.device_get(out)))

        batcher = StackBatcher(proc, run_batch, **kwargs)
        outer = self
        orig_install, orig_close = batcher.install, batcher.close

        def install():
            orig_install()
            register_infer_hook(outer, batcher)
            return batcher

        def close():
            unregister_infer_hook(outer)
            orig_close()

        batcher.install, batcher.close = install, close
        return batcher

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for key, value in weights.items():
            k = key
            if not k.startswith("net.") and not k.startswith("model."):
                k = "net.model." + k
            elif k.startswith("model."):
                k = "net." + k
            # torch UniDeepFsmn conv1 is Conv2d (O, 39, 1, I/g) → ours (O, 39, 1)
            if k.endswith(".fsmn.conv1.weight") and value.ndim == 4:
                value = value.reshape(value.shape[0], -1, 1)
            if k.endswith(".fsmn.conv1"):
                pass
            # ConvModule stores the raw depthwise weight
            k = k.replace(".conv_module.conv.weight", ".conv_module.weight")
            # PReLU torch name
            k = k.replace(".prelu.weight", ".prelu_weight")
            out[k] = value
        return out
