"""SAM-Audio configuration.

Mirrors the reference mlx_audio/sts/models/sam_audio/config.py:10-140.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ....codec.models.dacvae.dacvae import DACVAEConfig


@dataclass
class T5Config:
    """T5 encoder architecture (reference text_encoder.py:19-51)."""

    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = False
    dense_act_fn: str = "relu"


@dataclass
class T5EncoderConfig:
    """Text-encoder wrapper config (reference config.py:10-16)."""

    name: str = "t5-base"
    max_length: Optional[int] = 512
    dim: int = 768
    t5: T5Config = field(default_factory=T5Config)


@dataclass
class TransformerConfig:
    """DiT config (reference config.py:20-53)."""

    dim: int = 2816
    n_heads: int = 22
    n_layers: int = 22
    norm_eps: float = 1e-5
    qk_norm: bool = True
    fc_bias: bool = False
    ffn_exp: int = 4
    ffn_dim_multiplier: float = 1.0
    multiple_of: int = 64
    non_linearity: str = "swiglu"
    use_rope: bool = True
    max_positions: int = 10000
    frequency_embedding_dim: int = 256
    timestep_non_linearity: str = "swiglu"
    t_block_non_linearity: str = "silu"
    t_block_bias: bool = True
    context_dim: int = 2816
    context_non_linearity: str = "swiglu"
    context_norm: bool = False
    out_channels: int = 256
    in_channels: Optional[int] = None


@dataclass
class SAMAudioConfig:
    """Main config (reference config.py:56-99). in_channels =
    6·codebook_dim ([noisy, zeros, features]×2 stacks)."""

    in_channels: int = 768
    audio_codec: DACVAEConfig = field(default_factory=DACVAEConfig)
    text_encoder: T5EncoderConfig = field(default_factory=T5EncoderConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    num_anchors: int = 3
    anchor_embedding_dim: int = 128

    @classmethod
    def from_dict(cls, d: dict) -> "SAMAudioConfig":
        codec = DACVAEConfig(**d.get("audio_codec", {})) \
            if isinstance(d.get("audio_codec", {}), dict) \
            else d["audio_codec"]
        te = d.get("text_encoder", {})
        te_names = {f.name for f in
                    T5EncoderConfig.__dataclass_fields__.values()} - {"t5"}
        text = T5EncoderConfig(**{k: v for k, v in te.items()
                                  if k in te_names})
        tr_names = {f.name for f in
                    TransformerConfig.__dataclass_fields__.values()}
        tr = TransformerConfig(**{k: v for k, v in
                                  d.get("transformer", {}).items()
                                  if k in tr_names})
        return cls(
            in_channels=d.get("in_channels", 6 * codec.codebook_dim),
            audio_codec=codec, text_encoder=text, transformer=tr,
            num_anchors=d.get("num_anchors", 3),
            anchor_embedding_dim=d.get("anchor_embedding_dim", 128))


def sam_audio_small() -> SAMAudioConfig:
    """reference config.py:104-117."""
    return SAMAudioConfig(transformer=TransformerConfig(
        dim=1024, n_heads=8, n_layers=12, context_dim=1024,
        out_channels=256))


def sam_audio_base() -> SAMAudioConfig:
    return SAMAudioConfig(transformer=TransformerConfig(
        dim=1536, n_heads=12, n_layers=16, context_dim=1536,
        out_channels=256))


def sam_audio_large() -> SAMAudioConfig:
    return SAMAudioConfig()
