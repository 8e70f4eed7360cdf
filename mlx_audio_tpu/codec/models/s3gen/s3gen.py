"""S3Gen: S3 speech tokens → waveform (flow matching + HiFT), used by
Chatterbox and CosyVoice-family models.

TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/s3gen.py:43-552.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import ConditionalDecoder
from .encoder import UpsampleConformerEncoder
from .flow import CausalMaskedDiffWithXvec
from .flow_matching import CFMParams, ConditionalCFM
from .hifigan import ConvRNNF0Predictor, HiFTGenerator
from .mel import mel_spectrogram
from .xvector import CAMPPlus
from ....nn.module import Module

S3_SR = 16_000
S3GEN_SR = 24_000

__all__ = ["S3Token2Mel", "S3Token2Wav", "CausalConditionalCFM",
           "S3_SR", "S3GEN_SR"]


class CausalConditionalCFM(ConditionalCFM):
    """CFM with deterministic (fixed-seed) noise
    (reference flow_matching.py:134-185)."""

    def __call__(self, mu, mask, n_timesteps, key=None, temperature=1.0,
                 spks=None, cond=None, streaming=False, meanflow=False):
        return super().__call__(mu, mask, n_timesteps,
                                key=jax.random.PRNGKey(42),
                                temperature=temperature, spks=spks,
                                cond=cond, streaming=streaming,
                                meanflow=meanflow)


class S3Token2Mel(Module):
    """Speech tokens → mel, with reference-audio conditioning
    (reference s3gen.py:43-209)."""

    def __init__(self):
        self.speaker_encoder = CAMPPlus()
        encoder = UpsampleConformerEncoder(
            input_size=512, output_size=512, attention_heads=8,
            linear_units=2048, num_blocks=6, num_up_blocks=4)
        estimator = ConditionalDecoder(
            in_channels=320, out_channels=80, causal=True, channels=[256],
            attention_head_dim=64, n_blocks=4, num_mid_blocks=12, num_heads=8)
        decoder = CausalConditionalCFM(
            in_channels=240, cfm_params=CFMParams(), spk_emb_dim=80,
            estimator=estimator)
        self.flow = CausalMaskedDiffWithXvec(encoder=encoder, decoder=decoder)

    def embed_ref(self, ref_wav: np.ndarray, ref_sr: int,
                  ref_speech_tokens: np.ndarray,
                  ref_speech_token_lens=None) -> Dict:
        """Reference waveform + tokens → prompt dict
        (reference s3gen.py:99-178)."""
        from ....utils import resample_audio

        ref_wav = np.asarray(ref_wav, np.float32).reshape(-1)
        wav_24 = (ref_wav if ref_sr == S3GEN_SR
                  else resample_audio(ref_wav, ref_sr, S3GEN_SR))
        mels = np.asarray(mel_spectrogram(
            wav_24, num_mels=self.flow.output_size))  # (1, T, n_mels)

        wav_16 = (ref_wav if ref_sr == S3_SR
                  else resample_audio(ref_wav, ref_sr, S3_SR))
        x_vector = np.asarray(self.speaker_encoder.inference(
            jnp.asarray(wav_16)))

        tokens = np.asarray(ref_speech_tokens).reshape(1, -1)
        n_tok = tokens.shape[1]
        want_tok = mels.shape[1] // 2
        if n_tok < want_tok:
            mels = mels[:, : 2 * n_tok]
        elif n_tok > want_tok:
            tokens = tokens[:, :want_tok]
            n_tok = want_tok
        return dict(
            prompt_token=tokens,
            prompt_token_len=np.array([n_tok]),
            prompt_feat=mels,
            embedding=x_vector,
        )

    def __call__(self, speech_tokens, ref_dict: Dict,
                 finalize: bool = True) -> jnp.ndarray:
        tokens = np.asarray(speech_tokens).reshape(1, -1)
        feat, _ = self.flow.inference(
            token=jnp.asarray(tokens, jnp.int32),
            token_len=jnp.asarray([tokens.shape[1]], jnp.int32),
            prompt_token=jnp.asarray(ref_dict["prompt_token"], jnp.int32),
            prompt_token_len=jnp.asarray(ref_dict["prompt_token_len"],
                                         jnp.int32),
            prompt_feat=jnp.asarray(ref_dict["prompt_feat"]),
            embedding=jnp.asarray(ref_dict["embedding"]),
            finalize=finalize,
        )
        return feat  # (1, T_new, 80)


class S3Token2Wav(S3Token2Mel):
    """+ HiFT vocoder and fade-in (reference s3gen.py:212-552)."""

    def __init__(self):
        super().__init__()
        self.mel2wav = HiFTGenerator(
            sampling_rate=S3GEN_SR,
            upsample_rates=[8, 5, 3],
            upsample_kernel_sizes=[16, 11, 7],
            source_resblock_kernel_sizes=[7, 7, 11],
            source_resblock_dilation_sizes=[[1, 3, 5]] * 3,
            f0_predictor=ConvRNNF0Predictor(),
        )
        n_trim = S3GEN_SR // 50
        fade = (jnp.cos(jnp.linspace(jnp.pi, 0.0, n_trim)) + 1) / 2
        self._trim_fade = jnp.concatenate([jnp.zeros(n_trim), fade])

    def flow_inference(self, speech_tokens, ref_dict, finalize=True):
        return S3Token2Mel.__call__(self, speech_tokens, ref_dict, finalize)

    def hift_inference(self, speech_feat, cache_source=None, key=None):
        return self.mel2wav.inference(speech_feat, key=key,
                                      cache_source=cache_source)

    def inference(self, speech_tokens, ref_dict,
                  cache_source: Optional[jnp.ndarray] = None,
                  finalize: bool = True,
                  key=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mels = self.flow_inference(speech_tokens, ref_dict, finalize)
        wavs, sources = self.hift_inference(mels, cache_source, key=key)
        fade_len = self._trim_fade.shape[0]
        if wavs.shape[1] >= fade_len:
            wavs = wavs.at[:, :fade_len].multiply(self._trim_fade)
        return wavs, sources

    def __call__(self, speech_tokens, ref_dict, finalize: bool = True,
                 key=None) -> jnp.ndarray:
        return self.inference(speech_tokens, ref_dict, finalize=finalize,
                              key=key)[0]
