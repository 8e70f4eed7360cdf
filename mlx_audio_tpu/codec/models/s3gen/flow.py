"""Token→mel flow module (CausalMaskedDiffWithXvec).

TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/flow.py:12-162. The inference path
(speaker projection → token embed → upsample-conformer encode → CFM solve)
is a single jit per shape bucket; the caller pads tokens/prompt features
to bucketed lengths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .decoder import ConditionalDecoder
from .encoder import UpsampleConformerEncoder, make_non_pad_mask
from .flow_matching import CFMParams, ConditionalCFM

__all__ = ["CausalMaskedDiffWithXvec"]


class CausalMaskedDiffWithXvec(Module):
    def __init__(
        self,
        input_size: int = 512,
        output_size: int = 80,
        spk_embed_dim: int = 192,
        vocab_size: int = 6561,
        input_frame_rate: int = 25,
        token_mel_ratio: int = 2,
        pre_lookahead_len: int = 3,
        n_timesteps: int = 10,
        encoder: Optional[UpsampleConformerEncoder] = None,
        decoder: Optional[ConditionalCFM] = None,
    ):
        self.input_size = input_size
        self.output_size = output_size
        self.input_frame_rate = input_frame_rate
        self.token_mel_ratio = token_mel_ratio
        self.pre_lookahead_len = pre_lookahead_len
        self.n_timesteps = n_timesteps

        self.input_embedding = nn.Embedding(vocab_size, input_size)
        self.spk_embed_affine_layer = nn.Linear(spk_embed_dim, output_size)
        self.encoder = encoder or UpsampleConformerEncoder(
            input_size=input_size, output_size=input_size)
        self.encoder_proj = nn.Linear(self.encoder.output_size(), output_size)
        self.decoder = decoder or ConditionalCFM(
            in_channels=240, cfm_params=CFMParams(),
            estimator=ConditionalDecoder(in_channels=320,
                                         out_channels=output_size))

    def inference(
        self,
        token: jnp.ndarray,
        token_len: jnp.ndarray,
        prompt_token: jnp.ndarray,
        prompt_token_len: jnp.ndarray,
        prompt_feat: jnp.ndarray,
        embedding: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        finalize: bool = True,
        n_timesteps: Optional[int] = None,
        streaming: bool = False,
        meanflow: bool = False,
    ) -> Tuple[jnp.ndarray, None]:
        """token (1, T) + prompt mel (1, T_pm, 80) + x-vector (1, 192)
        → mel (1, T_new, 80) for the non-prompt region.

        reference flow.py:69-162 (channels-last output here).
        """
        # Stage-boundary dtype (same convention as kokoro._synthesize): the
        # flow stage computes in its parameters' dtype. Callers hand in f32
        # speaker vectors / prompt mels; without this cast Linear's
        # activation-dtype-wins rule silently upcasts the whole conformer +
        # UNet to f32 — measured at 35% of HBM roof on v5e (ROOFLINE.json)
        # precisely because every weight was being streamed as f32.
        wdt = self.input_embedding.weight.dtype
        emb = embedding / (jnp.linalg.norm(embedding.astype(jnp.float32),
                                           axis=1, keepdims=True) + 1e-8
                           ).astype(embedding.dtype)
        emb = self.spk_embed_affine_layer(emb.astype(wdt))
        prompt_feat = prompt_feat.astype(wdt)

        token = jnp.concatenate([prompt_token, token], axis=1)
        token_len = prompt_token_len + token_len
        T = token.shape[1]
        mask = make_non_pad_mask(token_len, T)[..., None].astype(emb.dtype)
        token = jnp.clip(token, 0, self.input_embedding.weight.shape[0] - 1)
        h = self.input_embedding(token) * mask

        h, _ = self.encoder(h, token_len, streaming=streaming)
        if not finalize:
            h = h[:, : h.shape[1] - self.pre_lookahead_len * self.token_mel_ratio]
        mel_len1 = prompt_feat.shape[1]
        mel_len2 = h.shape[1] - mel_len1
        h = self.encoder_proj(h)

        conds = jnp.zeros((1, h.shape[1], self.output_size), h.dtype)
        conds = conds.at[:, :mel_len1].set(prompt_feat)
        # valid mel region = token_len * token_mel_ratio (padding beyond the
        # bucketed token tail is masked out of the CFM attention)
        dec_mask = (jnp.arange(h.shape[1])[None, :, None]
                    < (token_len[:, None, None] * self.token_mel_ratio)
                    ).astype(h.dtype)

        if key is None:
            key = jax.random.PRNGKey(0)
        feat, _ = self.decoder(
            mu=h, mask=dec_mask, n_timesteps=n_timesteps or self.n_timesteps,
            key=key, spks=emb, cond=conds, streaming=streaming,
            **({"meanflow": True} if meanflow else {}))
        return feat[:, mel_len1:], None
