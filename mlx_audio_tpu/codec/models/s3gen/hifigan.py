"""HiFT-Net generator (HiFi-GAN + neural source filter + ISTFT head) for
S3Gen / CosyVoice2.

TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/hifigan.py:27-839 and
mlx_audio/codec/models/s3gen/f0_predictor.py. Channels-last throughout;
the tiny n_fft=16 STFT/ISTFT run in-graph via dsp.stft/istft (complex
stays on device — the axon tunnel cannot transfer complex), and all
randomness (harmonic phases, NSF noise) is driven by an explicit PRNG key
so the whole mel→wav path is one jitted program.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ....dsp import istft as dsp_istft
from ....dsp import stft as dsp_stft
from ....nn import layers as nn
from ....nn.module import Module

__all__ = ["HiFTGenerator", "ConvRNNF0Predictor", "SineGen",
           "SourceModuleHnNSF", "Snake", "ResBlock"]


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _hann_periodic(size: int) -> jnp.ndarray:
    n = jnp.arange(size)
    return 0.5 - 0.5 * jnp.cos(2.0 * math.pi * n / size)


def _linear_interp_to(x: jnp.ndarray, new_size: int) -> jnp.ndarray:
    """Linear resample along the last axis (reference hifigan.py:172-200)."""
    T = x.shape[-1]
    if new_size == T:
        return x
    pos = jnp.linspace(0.0, T - 1, new_size)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = pos - lo
    return jnp.take(x, lo, axis=-1) * (1 - w) + jnp.take(x, hi, axis=-1) * w


class Snake(Module):
    """x + (1/α)·sin²(αx), per-channel α (reference hifigan.py:27-107).
    x: (B, T, C)."""

    def __init__(self, in_features: int, alpha: float = 1.0,
                 alpha_logscale: bool = False):
        self.alpha_logscale = alpha_logscale
        self.alpha = (jnp.zeros(in_features) if alpha_logscale
                      else jnp.ones(in_features) * alpha)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.alpha[None, None, :]
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        sign = jnp.where(alpha >= 0, 1.0, -1.0)
        safe = sign * jnp.maximum(jnp.abs(alpha), 1e-4)
        return x + (1.0 / safe) * jnp.sin(x * alpha) ** 2


class ResBlock(Module):
    """Dilated residual block with Snake activations
    (reference hifigan.py:108-170). (B, T, C) in/out."""

    def __init__(self, channels: int = 512, kernel_size: int = 3,
                 dilations: Optional[List[int]] = None):
        dilations = dilations or [1, 3, 5]
        self.convs1 = [
            nn.Conv1d(channels, channels, kernel_size, dilation=d,
                      padding=get_padding(kernel_size, d))
            for d in dilations
        ]
        self.convs2 = [
            nn.Conv1d(channels, channels, kernel_size,
                      padding=get_padding(kernel_size, 1))
            for _ in dilations
        ]
        self.activations1 = [Snake(channels) for _ in dilations]
        self.activations2 = [Snake(channels) for _ in dilations]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2,
                                  self.activations1, self.activations2):
            xt = c2(a2(c1(a1(x))))
            x = x + xt
        return x


class SineGen(Module):
    """Harmonic sine generator (reference hifigan.py:201-338).

    f0: (B, 1, T) Hz → sine_waves (B, T, H+1). `key` drives random phases
    and noise; pass a fixed key for reproducible output.
    """

    def __init__(self, samp_rate: int, harmonic_num: int = 0,
                 sine_amp: float = 0.1, noise_std: float = 0.003,
                 voiced_threshold: float = 0.0,
                 use_interpolation: bool = False, upsample_scale: int = 1):
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.harmonic_num = harmonic_num
        self.sampling_rate = samp_rate
        self.voiced_threshold = voiced_threshold
        self.use_interpolation = use_interpolation
        self.upsample_scale = upsample_scale

    def __call__(self, f0: jnp.ndarray,
                 key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, _, T = f0.shape
        H = self.harmonic_num + 1
        k_phase, k_noise = jax.random.split(key)
        harmonics = jnp.arange(1, H + 1, dtype=f0.dtype)

        if self.use_interpolation:
            # phase computed at frame rate then upsampled (24 kHz variant,
            # reference hifigan.py:241-283)
            fn = f0[:, 0, :, None] * harmonics[None, None, :]  # (B, T, H)
            rad = (fn / self.sampling_rate) % 1.0
            rand_ini = jax.random.uniform(k_phase, (B, H))
            rand_ini = rand_ini.at[:, 0].set(0.0)
            rad = rad.at[:, 0, :].add(rand_ini)
            rad_t = rad.transpose(0, 2, 1)  # (B, H, T)
            t_down = max(1, T // self.upsample_scale)
            rad_down = _linear_interp_to(rad_t, t_down)
            phase = jnp.cumsum(rad_down, axis=-1) * 2.0 * math.pi
            phase = _linear_interp_to(phase * self.upsample_scale, T)
            sines = jnp.sin(phase).transpose(0, 2, 1) * self.sine_amp
        else:
            F_mat = f0 * harmonics[None, :, None] / self.sampling_rate
            theta = 2.0 * math.pi * (jnp.cumsum(F_mat, axis=-1) % 1.0)
            phase_vec = jax.random.uniform(k_phase, (B, H, 1),
                                           minval=-math.pi, maxval=math.pi)
            phase_vec = phase_vec.at[:, 0].set(0.0)
            sines = (self.sine_amp * jnp.sin(theta + phase_vec)
                     ).transpose(0, 2, 1)  # (B, T, H)

        uv = (f0 > self.voiced_threshold).astype(f0.dtype)  # (B, 1, T)
        uv = uv.transpose(0, 2, 1)  # (B, T, 1)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.random.normal(k_noise, sines.shape)
        return sines * uv + noise, uv


class SourceModuleHnNSF(Module):
    """Merge harmonics into one excitation (reference hifigan.py:339-406)."""

    def __init__(self, sampling_rate: int, upsample_scale: int,
                 harmonic_num: int = 0, sine_amp: float = 0.1,
                 add_noise_std: float = 0.003, voiced_threshod: float = 0.0,
                 use_interpolation: bool = False):
        self.l_sin_gen = SineGen(sampling_rate, harmonic_num, sine_amp,
                                 add_noise_std, voiced_threshod,
                                 use_interpolation, upsample_scale)
        self.l_linear = nn.Linear(harmonic_num + 1, 1)

    def __call__(self, f0_up: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        """f0_up: (B, T, 1) → source (B, T, 1)."""
        sines, _ = self.l_sin_gen(f0_up.transpose(0, 2, 1), key)
        return jnp.tanh(self.l_linear(sines))


class ConvRNNF0Predictor(Module):
    """Conv stack F0 predictor (reference f0_predictor.py:10-83).
    x: (B, T, n_mels) → f0 (B, T)."""

    def __init__(self, num_class: int = 1, in_channels: int = 80,
                 cond_channels: int = 512):
        self.condnet = [
            nn.Conv1d(in_channels, cond_channels, 3, padding=1),
            nn.Conv1d(cond_channels, cond_channels, 3, padding=1),
            nn.Conv1d(cond_channels, cond_channels, 3, padding=1),
            nn.Conv1d(cond_channels, cond_channels, 3, padding=1),
            nn.Conv1d(cond_channels, cond_channels, 3, padding=1),
        ]
        self.classifier = nn.Linear(cond_channels, num_class)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for conv in self.condnet:
            x = jax.nn.elu(conv(x))
        return jnp.abs(self.classifier(x)[..., 0])


class HiFTGenerator(Module):
    """HiFT-Net: mel (B, T, 80) → waveform (B, T·scale)
    (reference hifigan.py:553-839).
    """

    def __init__(
        self,
        in_channels: int = 80,
        base_channels: int = 512,
        nb_harmonics: int = 8,
        sampling_rate: int = 22050,
        nsf_alpha: float = 0.1,
        nsf_sigma: float = 0.003,
        nsf_voiced_threshold: float = 10.0,
        upsample_rates: Optional[List[int]] = None,
        upsample_kernel_sizes: Optional[List[int]] = None,
        istft_params: Optional[dict] = None,
        resblock_kernel_sizes: Optional[List[int]] = None,
        resblock_dilation_sizes: Optional[List[List[int]]] = None,
        source_resblock_kernel_sizes: Optional[List[int]] = None,
        source_resblock_dilation_sizes: Optional[List[List[int]]] = None,
        lrelu_slope: float = 0.1,
        audio_limit: float = 0.99,
        f0_predictor: Optional[Module] = None,
        use_interpolation: bool = False,
    ):
        upsample_rates = upsample_rates or [8, 8]
        upsample_kernel_sizes = upsample_kernel_sizes or [16, 16]
        istft_params = istft_params or {"n_fft": 16, "hop_len": 4}
        resblock_kernel_sizes = resblock_kernel_sizes or [3, 7, 11]
        resblock_dilation_sizes = resblock_dilation_sizes or [[1, 3, 5]] * 3
        source_resblock_kernel_sizes = source_resblock_kernel_sizes or [7, 11]
        source_resblock_dilation_sizes = (source_resblock_dilation_sizes
                                          or [[1, 3, 5]] * 2)

        self.sampling_rate = sampling_rate
        self.istft_params = dict(istft_params)
        self.lrelu_slope = lrelu_slope
        self.audio_limit = audio_limit
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)

        upsample_scale = math.prod(upsample_rates) * istft_params["hop_len"]
        self.f0_upsample_scale = upsample_scale
        self.m_source = SourceModuleHnNSF(
            sampling_rate=sampling_rate, upsample_scale=upsample_scale,
            harmonic_num=nb_harmonics, sine_amp=nsf_alpha,
            add_noise_std=nsf_sigma, voiced_threshod=nsf_voiced_threshold,
            use_interpolation=use_interpolation)

        self.conv_pre = nn.Conv1d(in_channels, base_channels, 7, padding=3)

        self.ups = [
            nn.ConvTranspose1d(base_channels // (2**i),
                               base_channels // (2 ** (i + 1)), k,
                               stride=u, padding=(k - u) // 2)
            for i, (u, k) in enumerate(zip(upsample_rates,
                                           upsample_kernel_sizes))
        ]

        self.source_downs = []
        self.source_resblocks = []
        downsample_rates = [1] + upsample_rates[::-1][:-1]
        cum = []
        p = 1
        for r in downsample_rates:
            p *= r
            cum.append(p)
        for i, (u, k, d) in enumerate(zip(cum[::-1],
                                          source_resblock_kernel_sizes,
                                          source_resblock_dilation_sizes)):
            ch = base_channels // (2 ** (i + 1))
            if u == 1:
                self.source_downs.append(
                    nn.Conv1d(istft_params["n_fft"] + 2, ch, 1))
            else:
                self.source_downs.append(
                    nn.Conv1d(istft_params["n_fft"] + 2, ch, u * 2,
                              stride=u, padding=u // 2))
            self.source_resblocks.append(ResBlock(ch, k, d))

        self.resblocks = []
        for i in range(len(self.ups)):
            ch = base_channels // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(ResBlock(ch, k, d))

        ch = base_channels // (2 ** len(self.ups))
        self.conv_post = nn.Conv1d(ch, istft_params["n_fft"] + 2, 7, padding=3)
        self._stft_window = _hann_periodic(istft_params["n_fft"])
        self.f0_predictor = f0_predictor or ConvRNNF0Predictor(
            in_channels=in_channels)

    # ------------------------------------------------------------------
    def _stft(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) → (B, frames, n_fft+2) real||imag."""
        spec = dsp_stft(x, n_fft=self.istft_params["n_fft"],
                        hop_length=self.istft_params["hop_len"],
                        win_length=self.istft_params["n_fft"],
                        window=self._stft_window, center=True,
                        pad_mode="reflect")
        return jnp.concatenate([spec.real, spec.imag], axis=-1)

    def _istft(self, magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """(B, frames, n_fft//2+1) ×2 → (B, T)."""
        magnitude = jnp.clip(magnitude, None, 1e2)
        # mag·cos/sin instead of mag·exp(1j·phase): complex Exp is
        # unimplemented on some TPU backends, and two real elementwise ops
        # fuse better anyway.
        spec = jax.lax.complex(magnitude * jnp.cos(phase),
                               magnitude * jnp.sin(phase))
        return dsp_istft(spec.swapaxes(-1, -2),
                         hop_length=self.istft_params["hop_len"],
                         win_length=self.istft_params["n_fft"],
                         window=self._stft_window, center=True)

    def decode(self, mel: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        """mel: (B, T, C); s: (B, T_wav) source → (B, T_wav')."""
        # source STFT runs f32 (phase fidelity); the conv stack consumes it
        # in the mel/model dtype so mixed-precision doesn't upcast the stack
        s_stft = self._stft(s).astype(mel.dtype)  # (B, frames, n_fft+2)
        x = self.conv_pre(mel)
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, self.lrelu_slope)
            x = self.ups[i](x)
            if i == self.num_upsamples - 1:
                x = jnp.concatenate([x[:, 1:2], x], axis=1)  # reflect pad 1
            si = self.source_resblocks[i](self.source_downs[i](s_stft))
            x = x + si[:, : x.shape[1]]
            xs = [self.resblocks[i * self.num_kernels + j](x)
                  for j in range(self.num_kernels)]
            x = sum(xs) / self.num_kernels
        x = jax.nn.leaky_relu(x, self.lrelu_slope)
        # ISTFT head math stays f32 (exp/sin + overlap-add reconstruction)
        x = self.conv_post(x).astype(jnp.float32)  # (B, frames, n_fft+2)
        half = self.istft_params["n_fft"] // 2 + 1
        magnitude = jnp.exp(x[..., :half])
        phase = jnp.sin(x[..., half:])
        wav = self._istft(magnitude, phase)
        return jnp.clip(wav, -self.audio_limit, self.audio_limit)

    def __call__(self, speech_feat: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None,
                 cache_source: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """speech_feat: (B, T, n_mels) → (wav (B, T_wav), source)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        # stage-boundary dtype: the vocoder computes in its own parameter
        # dtype even when handed f32 mel from the host
        speech_feat = speech_feat.astype(self.conv_pre.weight.dtype)
        f0 = self.f0_predictor(speech_feat)  # (B, T)
        # NSF source is phase-critical (cumsum over the full waveform
        # length), so it always runs f32 regardless of the conv stack's
        # compute dtype — same rule as kokoro's Generator.
        f0_up = jnp.repeat(f0[:, :, None], self.f0_upsample_scale,
                           axis=1).astype(jnp.float32)
        s = self.m_source(f0_up, key)[..., 0]  # (B, T_wav) f32
        if cache_source is not None and cache_source.shape[-1] > 0:
            n = cache_source.shape[-1]
            s = jnp.concatenate([cache_source, s[:, n:]], axis=-1)
        return self.decode(speech_feat, s), s

    def inference(self, speech_feat, key=None, cache_source=None):
        return self(speech_feat, key=key, cache_source=cache_source)
