"""Causal HiFT vocoder for CosyVoice3 (24 kHz).

TPU-native re-implementation of the reference
mlx_audio/tts/models/cosyvoice3/hifigan.py:20-766 and
convolution.py:17-257. Every conv is causal (left- or right-padded valid
conv) so the same weights serve offline and streaming decode; channels-last
(B, T, C) throughout; the tiny 16-point NSF STFT/iSTFT run in-graph via
`dsp.stft/istft` so the whole mel→wav path is one XLA program.
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
from ....codec.models.s3gen.hifigan import Snake, _hann_periodic

__all__ = ["CausalHiFTGenerator", "CausalConv1d", "CausalResBlock",
           "SineGen2", "SourceModuleHnNSF2", "CausalConvRNNF0Predictor"]


class CausalConv1d(Module):
    """Valid conv with (k−1)·d padding on one side
    (reference convolution.py:17-103). x: (B, T, C)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, dilation: int = 1, groups: int = 1,
                 bias: bool = True, causal_type: str = "left"):
        assert causal_type in ("left", "right")
        self.causal_padding = (kernel_size - 1) * dilation
        self.causal_type = causal_type
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              dilation=dilation, groups=groups, bias=bias)

    def __call__(self, x: jnp.ndarray,
                 cache: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if cache is None:
            pad = ((0, 0), (self.causal_padding, 0), (0, 0)) \
                if self.causal_type == "left" \
                else ((0, 0), (0, self.causal_padding), (0, 0))
            x = jnp.pad(x, pad)
        elif self.causal_type == "left":
            x = jnp.concatenate([cache, x], axis=1)
        else:
            x = jnp.concatenate([x, cache], axis=1)
        return self.conv(x)


class CausalConv1dDownSample(Module):
    """Strided causal conv, pad stride−1 left
    (reference convolution.py:106-176)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int):
        assert stride != 1 and kernel_size % stride == 0
        self.causal_padding = stride - 1
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              stride=stride)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(jnp.pad(
            x, ((0, 0), (self.causal_padding, 0), (0, 0))))


class CausalConv1dUpsample(Module):
    """Nearest ×stride repeat + causal conv
    (reference convolution.py:179-256)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int):
        self.causal_padding = kernel_size - 1
        self.upsample_factor = stride
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, self.upsample_factor, axis=1)
        return self.conv(jnp.pad(
            x, ((0, 0), (self.causal_padding, 0), (0, 0))))


class CausalResBlock(Module):
    """Snake-activated residual block, causal convs
    (reference hifigan.py:87-147)."""

    def __init__(self, channels: int, kernel_size: int = 3,
                 dilations: Optional[List[int]] = None):
        dilations = dilations or [1, 3, 5]
        self.convs1 = [CausalConv1d(channels, channels, kernel_size,
                                    dilation=d) for d in dilations]
        self.convs2 = [CausalConv1d(channels, channels, kernel_size)
                       for _ in dilations]
        self.activations1 = [Snake(channels) for _ in dilations]
        self.activations2 = [Snake(channels) for _ in dilations]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2,
                                  self.activations1, self.activations2):
            x = c2(a2(c1(a1(x)))) + x
        return x


def _interp_linear_pt(x: jnp.ndarray, new_T: int) -> jnp.ndarray:
    """PyTorch F.interpolate(align_corners=False) along axis 1.
    x: (B, T, C) (reference hifigan.py:20-65)."""
    T = x.shape[1]
    pos = (jnp.arange(new_T) + 0.5) * (T / new_T) - 0.5
    pos = jnp.clip(pos, 0.0, T - 1.001)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (pos - lo)[None, :, None]
    return jnp.take(x, lo, axis=1) * (1 - w) + jnp.take(x, hi, axis=1) * w


class SineGen2(Module):
    """Harmonic sine source with frame-rate phase accumulation and nearest
    phase upsampling (causal 24 kHz variant, reference hifigan.py:150-249).
    """

    def __init__(self, sampling_rate: int, upsample_scale: int,
                 harmonic_num: int = 0, sine_amp: float = 0.1,
                 noise_std: float = 0.003, voiced_threshold: float = 0.0):
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.harmonic_num = harmonic_num
        self.sampling_rate = sampling_rate
        self.voiced_threshold = voiced_threshold
        self.upsample_scale = upsample_scale

    def __call__(self, f0: jnp.ndarray, key: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """f0: (B, T, 1) at sample rate → (sines (B, T, H+1), uv)."""
        B, T, _ = f0.shape
        H = self.harmonic_num + 1
        k_phase, k_noise = jax.random.split(key)
        harmonics = jnp.arange(1, H + 1, dtype=f0.dtype)
        rad = (f0 * harmonics[None, None, :] / self.sampling_rate) % 1.0
        rand_ini = jax.random.uniform(k_phase, (B, H)).at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
        # accumulate at frame rate, then nearest-upsample the phase
        rad_down = _interp_linear_pt(rad, max(1, T // self.upsample_scale))
        phase = jnp.cumsum(rad_down, axis=1) * 2.0 * math.pi
        phase = jnp.repeat(phase, self.upsample_scale, axis=1)[:, :T]
        sines = jnp.sin(phase * self.upsample_scale)

        uv = (f0 > self.voiced_threshold).astype(f0.dtype)  # (B, T, 1)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.random.normal(k_noise, sines.shape)
        return sines * self.sine_amp * uv + noise, uv


class SourceModuleHnNSF2(Module):
    """Merge harmonics → excitation (reference hifigan.py:252-295)."""

    def __init__(self, sampling_rate: int, upsample_scale: int,
                 harmonic_num: int = 0, sine_amp: float = 0.1,
                 add_noise_std: float = 0.003,
                 voiced_threshold: float = 0.0):
        self.l_sin_gen = SineGen2(sampling_rate, upsample_scale,
                                  harmonic_num, sine_amp, add_noise_std,
                                  voiced_threshold)
        self.l_linear = nn.Linear(harmonic_num + 1, 1)

    def __call__(self, f0_up: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        sines, _ = self.l_sin_gen(f0_up, key)
        return jnp.tanh(self.l_linear(sines))  # (B, T, 1)


class CausalConvRNNF0Predictor(Module):
    """Causal conv F0 predictor: first layer looks right, rest left
    (reference hifigan.py:298-373). x: (B, T, n_mels) → f0 (B, T)."""

    def __init__(self, num_class: int = 1, in_channels: int = 80,
                 cond_channels: int = 512):
        self.condnet_0 = CausalConv1d(in_channels, cond_channels, 4,
                                      causal_type="right")
        self.condnet_2 = CausalConv1d(cond_channels, cond_channels, 3)
        self.condnet_4 = CausalConv1d(cond_channels, cond_channels, 3)
        self.condnet_6 = CausalConv1d(cond_channels, cond_channels, 3)
        self.condnet_8 = CausalConv1d(cond_channels, cond_channels, 3)
        self.classifier = nn.Linear(cond_channels, num_class)

    def __call__(self, x: jnp.ndarray, finalize: bool = True) -> jnp.ndarray:
        if finalize:
            x = self.condnet_0(x)
        else:
            p = self.condnet_0.causal_padding
            x = self.condnet_0(x[:, :-p], cache=x[:, -p:])
        x = jax.nn.elu(x)
        for conv in (self.condnet_2, self.condnet_4, self.condnet_6,
                     self.condnet_8):
            x = jax.nn.elu(conv(x))
        return jnp.abs(self.classifier(x)[..., 0])


class CausalHiFTGenerator(Module):
    """Causal HiFT-Net: mel (B, T, 80) → waveform (B, T·480)
    (reference hifigan.py:501-766)."""

    def __init__(self, in_channels: int = 80, base_channels: int = 512,
                 nb_harmonics: int = 8, sampling_rate: int = 24000,
                 nsf_alpha: float = 0.1, nsf_sigma: float = 0.003,
                 nsf_voiced_threshold: float = 10.0,
                 upsample_rates: Optional[List[int]] = None,
                 upsample_kernel_sizes: Optional[List[int]] = None,
                 istft_params: Optional[dict] = None,
                 resblock_kernel_sizes: Optional[List[int]] = None,
                 resblock_dilation_sizes: Optional[List[List[int]]] = None,
                 source_resblock_kernel_sizes: Optional[List[int]] = None,
                 source_resblock_dilation_sizes: Optional[
                     List[List[int]]] = None,
                 lrelu_slope: float = 0.1, audio_limit: float = 0.99,
                 conv_pre_look_right: int = 4):
        upsample_rates = upsample_rates or [8, 5, 3]
        upsample_kernel_sizes = upsample_kernel_sizes or [16, 11, 7]
        istft_params = istft_params or {"n_fft": 16, "hop_len": 4}
        resblock_kernel_sizes = resblock_kernel_sizes or [3, 7, 11]
        resblock_dilation_sizes = resblock_dilation_sizes or [[1, 3, 5]] * 3
        source_resblock_kernel_sizes = (source_resblock_kernel_sizes
                                        or [7, 7, 11])
        source_resblock_dilation_sizes = (source_resblock_dilation_sizes
                                          or [[1, 3, 5]] * 3)
        assert len(source_resblock_kernel_sizes) == len(upsample_rates), \
            "one source-fusion block per upsample stage"

        self.sampling_rate = sampling_rate
        self.istft_params = dict(istft_params)
        self.lrelu_slope = lrelu_slope
        self.audio_limit = audio_limit
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.upsample_rates = list(upsample_rates)
        self.conv_pre_look_right = conv_pre_look_right

        upsample_scale = math.prod(upsample_rates) * istft_params["hop_len"]
        self.f0_upsample_scale = upsample_scale
        self.f0_predictor = CausalConvRNNF0Predictor(
            in_channels=in_channels, cond_channels=base_channels)
        self.m_source = SourceModuleHnNSF2(
            sampling_rate=sampling_rate, upsample_scale=upsample_scale,
            harmonic_num=nb_harmonics, sine_amp=nsf_alpha,
            add_noise_std=nsf_sigma, voiced_threshold=nsf_voiced_threshold)

        self.conv_pre = CausalConv1d(in_channels, base_channels,
                                     conv_pre_look_right + 1,
                                     causal_type="right")

        self.ups = [
            CausalConv1dUpsample(base_channels // (2**i),
                                 base_channels // (2 ** (i + 1)), k, u)
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
                    CausalConv1d(istft_params["n_fft"] + 2, ch, 1))
            else:
                self.source_downs.append(
                    CausalConv1dDownSample(istft_params["n_fft"] + 2, ch,
                                           u * 2, u))
            self.source_resblocks.append(CausalResBlock(ch, k, d))

        self.resblocks = []
        for i in range(len(self.ups)):
            ch = base_channels // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(CausalResBlock(ch, k, d))

        ch = base_channels // (2 ** len(self.ups))
        self.conv_post = CausalConv1d(ch, istft_params["n_fft"] + 2, 7)
        self._stft_window = _hann_periodic(istft_params["n_fft"])

    # ------------------------------------------------------------------
    def _stft(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) → (B, frames, n_fft+2) real||imag. The reference zero-pads
        the center frames (hifigan.py:382-425)."""
        spec = dsp_stft(x, n_fft=self.istft_params["n_fft"],
                        hop_length=self.istft_params["hop_len"],
                        win_length=self.istft_params["n_fft"],
                        window=self._stft_window, center=True,
                        pad_mode="constant")
        return jnp.concatenate([spec.real, spec.imag], axis=-1)

    def _istft(self, magnitude: jnp.ndarray, phase: jnp.ndarray
               ) -> jnp.ndarray:
        magnitude = jnp.clip(magnitude, None, 1e2)
        # mag·cos/sin, not mag·exp(1j·phase): complex Exp is unimplemented
        # on some TPU backends.
        spec = jax.lax.complex(magnitude * jnp.cos(phase),
                               magnitude * jnp.sin(phase))
        return dsp_istft(spec.swapaxes(-1, -2),
                         hop_length=self.istft_params["hop_len"],
                         win_length=self.istft_params["n_fft"],
                         window=self._stft_window, center=True)

    def decode(self, mel: jnp.ndarray, s: jnp.ndarray,
               finalize: bool = True) -> jnp.ndarray:
        """mel: (B, T, C); s: (B, T_wav) source → wav
        (reference hifigan.py:661-731)."""
        s_stft = self._stft(s)  # (B, frames, n_fft+2)
        if finalize:
            x = self.conv_pre(mel)
        else:
            p = self.conv_pre.causal_padding
            x = self.conv_pre(mel[:, :-p], cache=mel[:, -p:])
            trim = math.prod(self.upsample_rates) * self.conv_pre_look_right
            s_stft = s_stft[:, :-trim]

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

        x = jax.nn.leaky_relu(x)
        x = self.conv_post(x)  # (B, frames, n_fft+2)
        half = self.istft_params["n_fft"] // 2 + 1
        magnitude = jnp.exp(x[..., :half])
        phase = jnp.sin(x[..., half:])
        wav = self._istft(magnitude, phase)
        if not finalize:
            trim = math.prod(self.upsample_rates) \
                * self.istft_params["hop_len"]
            wav = wav[:, :-trim]
        return jnp.clip(wav, -self.audio_limit, self.audio_limit)

    def __call__(self, speech_feat: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None,
                 finalize: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """speech_feat: (B, T, n_mels) → (wav (B, T·480), source)
        (reference hifigan.py:733-766)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        f0 = self.f0_predictor(speech_feat, finalize=finalize)  # (B, T')
        f0_up = jnp.repeat(f0[:, :, None], self.f0_upsample_scale, axis=1)
        s = self.m_source(f0_up, key)[..., 0]  # (B, T_wav)
        if finalize:
            wav = self.decode(speech_feat, s, finalize=True)
        else:
            p = self.f0_predictor.condnet_0.causal_padding
            wav = self.decode(speech_feat[:, :-p], s, finalize=False)
        return wav, s
