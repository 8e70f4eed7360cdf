"""Kokoro iSTFTNet decoder (HiFiGAN-NSF + ISTFT head).

Behavioral spec: reference tts/models/kokoro/istftnet.py (Generator :696,
Decoder :902, SineGen :531, MLXSTFT :453). TPU-native differences:
channels-last throughout, weight-norm folded at load, the STFT head and the
NSF source STFT are batched jnp FFTs living inside the same jitted program
as the conv stacks (the reference loops per batch element on host), and the
sine source uses an explicit PRNG key.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import hanning
from ....nn import Conv1d, ConvTranspose1d, Linear, Module
from ..interpolate import interpolate
from .modules import AdaIN1d, AdainResBlk1d, leaky_relu

__all__ = ["Decoder", "Generator", "SineGen", "SourceModuleHnNSF", "STFTHead"]


class STFTHead(Module):
    """Batched STFT/ISTFT used by the NSF source analysis and the output head
    (replaces MLXSTFT; all complex math stays in-graph).

    TPU-native formulation: Kokoro's head runs at n_fft=20, hop=5 over
    ~1.8M-sample signals, where per-frame FFTs and gather/scatter overlap-add
    dominate the decoder's runtime. Both directions are therefore expressed
    as window-folded DFT *matmuls* (MXU path) with reshape/shift framing and
    overlap-add (no gather, no scatter) whenever n_fft % hop == 0; a generic
    gather/scatter path covers other geometries. The reference's phase
    unwrap (istftnet.py:417 mlx_unwrap) is intentionally omitted: unwrapping
    only adds multiples of 2π, which cos/sin discard, so it cannot change
    the reconstruction — it only costs a full-length cumsum.
    """

    def __init__(self, filter_length=800, hop_length=200, win_length=800):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self._window = hanning(win_length, periodic=True)

        # Window-folded real-DFT matrices (host-side constants).
        N = filter_length
        F = N // 2 + 1
        win = np.asarray(hanning(win_length, periodic=True), np.float64)
        n = np.arange(N)[:, None]
        f = np.arange(F)[None, :]
        ang = 2.0 * np.pi * n * f / N
        self._fwd_re = jnp.asarray(win[:, None] * np.cos(ang), jnp.float32)
        self._fwd_im = jnp.asarray(win[:, None] * -np.sin(ang), jnp.float32)
        wf = np.full(F, 2.0)
        wf[0] = 1.0
        if N % 2 == 0:
            wf[-1] = 1.0
        self._inv_re = jnp.asarray(
            (wf[:, None] * np.cos(ang.T) / N) * win[None, :], jnp.float32
        )
        self._inv_im = jnp.asarray(
            (wf[:, None] * -np.sin(ang.T) / N) * win[None, :], jnp.float32
        )

    def _frame(self, xp: jax.Array, num_frames: int) -> jax.Array:
        """xp (B, Lp) → frames (B, T, n_fft); reshape/shift when possible."""
        N, hop = self.filter_length, self.hop_length
        Lp = xp.shape[-1]
        if N % hop == 0 and Lp % hop == 0:
            r = N // hop
            xb = xp.reshape(xp.shape[0], Lp // hop, hop)
            cols = [xb[:, q : q + num_frames, :] for q in range(r)]
            return jnp.concatenate(cols, axis=-1)
        idx = (
            np.arange(num_frames)[:, None] * hop + np.arange(N)[None, :]
        )
        return jnp.take(xp, jnp.asarray(idx), axis=-1)

    def transform(self, x: jax.Array):
        """x: (B, L) → magnitude, phase each (B, F, T)."""
        pad = self.filter_length // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        num_frames = 1 + (xp.shape[-1] - self.filter_length) // self.hop_length
        frames = self._frame(xp.astype(jnp.float32), num_frames)  # (B, T, n_fft)
        re = frames @ self._fwd_re  # (B, T, F)
        im = frames @ self._fwd_im
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        return jnp.swapaxes(mag, -1, -2), jnp.swapaxes(phase, -1, -2)

    def inverse(self, magnitude: jax.Array, phase: jax.Array) -> jax.Array:
        """(B, F, T) mag/phase → (B, L) waveform via COLA-normalized OLA."""
        re = (magnitude * jnp.cos(phase)).astype(jnp.float32)
        im = (magnitude * jnp.sin(phase)).astype(jnp.float32)
        re = jnp.swapaxes(re, -1, -2)  # (B, T, F)
        im = jnp.swapaxes(im, -1, -2)
        frames = re @ self._inv_re + im @ self._inv_im  # (B, T, n_fft), windowed

        B, T, N = frames.shape
        hop = self.hop_length
        out_len = (T - 1) * hop + N
        if N % hop == 0:
            r = N // hop
            fwr = frames.reshape(B, T, r, hop)
            out = sum(
                jnp.pad(fwr[:, :, q, :], ((0, 0), (q, r - 1 - q), (0, 0)))
                for q in range(r)
            ).reshape(B, out_len)
        else:
            idx = (np.arange(T)[:, None] * hop + np.arange(N)[None, :]).reshape(-1)
            out = jnp.zeros((B, out_len), jnp.float32)
            out = out.at[:, jnp.asarray(idx)].add(frames.reshape(B, -1))
        # COLA denominator is input-independent → host-side constant
        # (recomputed in numpy: self._window is a pytree leaf, i.e. a tracer
        # under jit, and must not leave the graph).
        nwin = np.arange(self.win_length)
        win2 = (0.5 * (1 - np.cos(2 * np.pi * nwin / self.win_length))) ** 2
        idx = (np.arange(T)[:, None] * hop + np.arange(N)[None, :]).reshape(-1)
        wsum = np.zeros(out_len)
        np.add.at(wsum, idx, np.broadcast_to(win2, (T, N)).reshape(-1))
        out = out / jnp.asarray(np.maximum(wsum, 1e-10), jnp.float32)
        pad = self.filter_length // 2
        return out[:, pad:-pad]


class SineGen(Module):
    """Harmonic sine source for NSF (reference istftnet.py:531)."""

    def __init__(self, samp_rate: int, upsample_scale: int, harmonic_num: int = 0,
                 sine_amp: float = 0.1, noise_std: float = 0.003,
                 voiced_threshold: float = 0.0):
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.harmonic_num = harmonic_num
        self.dim = harmonic_num + 1
        self.sampling_rate = samp_rate
        self.voiced_threshold = voiced_threshold
        self.upsample_scale = int(upsample_scale)

    def _f02sine(self, f0_values: jax.Array, keys: jax.Array) -> jax.Array:
        # f0_values: (B, L, dim) at audio rate; keys: (B, 2) per-row PRNG —
        # noise is drawn per row so a request's waveform does not depend on
        # its batch position or on the batch size (serving determinism).
        rad = jnp.mod(f0_values / self.sampling_rate, 1.0)
        dim = f0_values.shape[2]
        rand_ini = jax.vmap(lambda k: jax.random.normal(k, (dim,)))(keys)
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
        # downsample phase increments to frame rate, integrate, upsample back
        rad_t = jnp.swapaxes(rad, 1, 2)  # (B, dim, L)
        rad_down = interpolate(rad_t, scale_factor=1 / self.upsample_scale, mode="linear")
        phase = jnp.cumsum(rad_down, axis=-1) * 2 * math.pi
        phase_up = interpolate(
            phase * self.upsample_scale, scale_factor=self.upsample_scale, mode="linear"
        )
        return jnp.sin(jnp.swapaxes(phase_up, 1, 2))

    def __call__(self, f0: jax.Array, keys: jax.Array):
        # f0: (B, L, 1) at audio rate; keys: (B, 2) per-row PRNG
        split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
        k1, k2 = split[:, 0], split[:, 1]
        fn = f0 * jnp.arange(1, self.harmonic_num + 2, dtype=f0.dtype)[None, None, :]
        sine_waves = self._f02sine(fn, k1) * self.sine_amp
        uv = (f0 > self.voiced_threshold).astype(jnp.float32)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.vmap(
            lambda k, sw: jax.random.normal(k, sw.shape)
        )(k2, sine_waves)
        return sine_waves * uv + noise, uv


class SourceModuleHnNSF(Module):
    def __init__(self, sampling_rate: int, upsample_scale: int, harmonic_num: int = 0,
                 sine_amp: float = 0.1, add_noise_std: float = 0.003,
                 voiced_threshod: float = 0.0):
        self.sine_amp = sine_amp
        self.l_sin_gen = SineGen(
            sampling_rate, upsample_scale, harmonic_num, sine_amp, add_noise_std,
            voiced_threshod,
        )
        self.l_linear = Linear(harmonic_num + 1, 1)

    def __call__(self, x: jax.Array, keys: jax.Array):
        sine_wavs, uv = self.l_sin_gen(x, keys)
        sine_merge = jnp.tanh(self.l_linear(sine_wavs))
        return sine_merge, uv


class Generator(Module):
    """HiFiGAN-NSF generator with ISTFT output head (reference :696)."""

    def __init__(self, style_dim, resblock_kernel_sizes, upsample_rates,
                 upsample_initial_channel, resblock_dilation_sizes,
                 upsample_kernel_sizes, gen_istft_n_fft, gen_istft_hop_size,
                 sample_rate: int = 24000):
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        total_up = int(np.prod(upsample_rates)) * gen_istft_hop_size
        self.total_upsample = total_up
        self.m_source = SourceModuleHnNSF(
            sampling_rate=sample_rate, upsample_scale=total_up, harmonic_num=8,
            voiced_threshod=10,
        )
        self.ups = []
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
            self.ups.append(
                ConvTranspose1d(
                    upsample_initial_channel // (2**i),
                    upsample_initial_channel // (2 ** (i + 1)),
                    k,
                    stride=u,
                    padding=(k - u) // 2,
                )
            )
        self.resblocks = []
        self.noise_convs = []
        self.noise_res = []
        for i in range(len(self.ups)):
            ch = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(ResBlockAdaINSnake(ch, k, d, style_dim))
            if i + 1 < len(upsample_rates):
                stride_f0 = int(np.prod(upsample_rates[i + 1 :]))
                self.noise_convs.append(
                    Conv1d(
                        gen_istft_n_fft + 2, ch, kernel_size=stride_f0 * 2,
                        stride=stride_f0, padding=(stride_f0 + 1) // 2,
                    )
                )
                self.noise_res.append(ResBlockAdaINSnake(ch, 7, [1, 3, 5], style_dim))
            else:
                self.noise_convs.append(Conv1d(gen_istft_n_fft + 2, ch, kernel_size=1))
                self.noise_res.append(ResBlockAdaINSnake(ch, 11, [1, 3, 5], style_dim))
        self.post_n_fft = gen_istft_n_fft
        self.conv_post = Conv1d(ch, gen_istft_n_fft + 2, 7, padding=3)
        self.stft = STFTHead(
            filter_length=gen_istft_n_fft, hop_length=gen_istft_hop_size,
            win_length=gen_istft_n_fft,
        )

    def __call__(self, x: jax.Array, s: jax.Array, f0: jax.Array,
                 keys: jax.Array, valid_frac=None):
        # x: (B, T, C); f0: (B, T_f0) frame-rate F0 curve; keys (B,2) or (2,).
        # The NSF source is phase-critical (cumsum over the full audio length)
        # so it always runs f32 regardless of the conv stack's compute dtype.
        if keys.ndim == 1:
            keys = jnp.broadcast_to(keys[None], (x.shape[0], keys.shape[0]))
        f0_up = interpolate(
            f0.astype(jnp.float32)[:, None, :],
            scale_factor=self.total_upsample,
            mode="nearest",
        )  # (B, 1, L)
        har_source, _ = self.m_source(jnp.swapaxes(f0_up, 1, 2), keys)  # (B, L, 1)
        har_spec, har_phase = self.stft.transform(har_source[..., 0])
        har = jnp.concatenate([har_spec, har_phase], axis=1)  # (B, 22, T')
        har = jnp.swapaxes(har, 1, 2).astype(x.dtype)  # (B, T', 22)

        for i in range(self.num_upsamples):
            x = leaky_relu(x, 0.1)
            x_source = self.noise_convs[i](har)
            x_source = self.noise_res[i](x_source, s, valid_frac)
            x = self.ups[i](x)
            if i == self.num_upsamples - 1:
                x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))  # reflection_pad (1, 0)
            x = x + x_source
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x, s, valid_frac)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels

        x = leaky_relu(x, 0.01)
        x = self.conv_post(x)  # (B, T', n_fft+2)
        x = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # head math stays f32
        spec = jnp.exp(x[:, : self.post_n_fft // 2 + 1, :])
        phase = jnp.sin(x[:, self.post_n_fft // 2 + 1 :, :])
        return self.stft.inverse(spec, phase)  # (B, L)


class ResBlockAdaINSnake(Module):
    """AdaINResBlock1 (reference istftnet.py:341): 3×(AdaIN→Snake→dilated conv
    →AdaIN→Snake→conv) with learnable per-channel snake alpha."""

    def __init__(self, channels: int, kernel_size: int, dilations, style_dim: int):
        def pad(d):
            return (kernel_size * d - d) // 2

        self.convs1 = [
            Conv1d(channels, channels, kernel_size, padding=pad(d), dilation=d)
            for d in dilations
        ]
        self.convs2 = [
            Conv1d(channels, channels, kernel_size, padding=pad(1)) for _ in dilations
        ]
        self.adain1 = [AdaIN1d(style_dim, channels) for _ in dilations]
        self.adain2 = [AdaIN1d(style_dim, channels) for _ in dilations]
        # stored (1, C, 1) to match checkpoint; broadcast over (B, T, C)
        self.alpha1 = [jnp.ones((1, channels, 1)) for _ in dilations]
        self.alpha2 = [jnp.ones((1, channels, 1)) for _ in dilations]

    def __call__(self, x: jax.Array, s: jax.Array, valid_frac=None) -> jax.Array:
        from .modules import valid_len_at

        vl = valid_len_at(x.shape[1], valid_frac)
        for c1, c2, n1, n2, a1, a2 in zip(
            self.convs1, self.convs2, self.adain1, self.adain2, self.alpha1, self.alpha2
        ):
            a1v = jnp.swapaxes(a1, 1, 2).astype(x.dtype)  # (1, 1, C)
            a2v = jnp.swapaxes(a2, 1, 2).astype(x.dtype)
            xt = n1(x, s, vl)
            xt = xt + (1.0 / a1v) * jnp.sin(a1v * xt) ** 2
            xt = c1(xt)
            xt = n2(xt, s, vl)
            xt = xt + (1.0 / a2v) * jnp.sin(a2v * xt) ** 2
            xt = c2(xt)
            x = xt + x
        return x


class Decoder(Module):
    """Top decoder (reference istftnet.py:902): AdaIN encode → 4 decode blocks
    with (asr_res, F0, N) skip concat → NSF generator."""

    def __init__(self, dim_in, style_dim, dim_out, resblock_kernel_sizes,
                 upsample_rates, upsample_initial_channel,
                 resblock_dilation_sizes, upsample_kernel_sizes,
                 gen_istft_n_fft, gen_istft_hop_size, sample_rate: int = 24000):
        bottleneck = 2 * max(dim_in, upsample_initial_channel)  # 1024 for Kokoro-82M
        self.encode = AdainResBlk1d(dim_in + 2, bottleneck, style_dim)
        self.decode = [
            AdainResBlk1d(bottleneck + 2 + 64, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + 64, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + 64, bottleneck, style_dim),
            AdainResBlk1d(
                bottleneck + 2 + 64, upsample_initial_channel, style_dim, upsample=True
            ),
        ]
        self.F0_conv = Conv1d(1, 1, 3, stride=2, padding=1)
        self.N_conv = Conv1d(1, 1, 3, stride=2, padding=1)
        self.asr_res = [Conv1d(dim_in, 64, 1)]
        self.generator = Generator(
            style_dim, resblock_kernel_sizes, upsample_rates,
            upsample_initial_channel, resblock_dilation_sizes,
            upsample_kernel_sizes, gen_istft_n_fft, gen_istft_hop_size,
            sample_rate=sample_rate,
        )

    def __call__(self, asr, F0_curve, N, s, keys, valid_frac=None):
        # asr: (B, T, 512); F0_curve/N: (B, 2T); s: (B, style)
        F0 = self.F0_conv(F0_curve[..., None])  # (B, T, 1)
        Nd = self.N_conv(N[..., None])
        x = jnp.concatenate([asr, F0, Nd], axis=-1)
        x = self.encode(x, s, valid_frac)
        asr_res = self.asr_res[0](asr)
        res = True
        for block in self.decode:
            if res:
                x = jnp.concatenate([x, asr_res, F0, Nd], axis=-1)
            x = block(x, s, valid_frac)
            if block.upsample_type:
                res = False
        return self.generator(x, s, F0_curve, keys, valid_frac)
