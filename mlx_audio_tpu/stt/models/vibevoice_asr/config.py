"""VibeVoice-ASR configuration.

Mirrors the reference mlx_audio/stt/models/vibevoice_asr/config.py:18-206.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _filter(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in cls.__dataclass_fields__.values()}
    return {k: v for k, v in d.items() if k in names}


@dataclass
class TokenizerEncoderConfig:
    """Shared acoustic/semantic encoder config
    (reference config.py:18-112)."""

    channels: int = 1
    causal: bool = True
    vae_dim: int = 64
    fix_std: float = 0.5
    std_dist_type: str = "gaussian"
    layernorm_eps: float = 1e-5
    conv_bias: bool = True
    layer_scale_init_value: float = 1e-6
    encoder_n_filters: int = 32
    encoder_ratios: Tuple[int, ...] = (8, 5, 5, 4, 2, 2)
    encoder_depths: str = "3-3-3-3-3-3-8"
    disable_last_norm: bool = True

    @property
    def parsed_encoder_depths(self) -> List[int]:
        if isinstance(self.encoder_depths, str):
            return [int(d) for d in self.encoder_depths.split("-")]
        return list(self.encoder_depths)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TokenizerEncoderConfig":
        return cls(**_filter(cls, d))


def semantic_defaults() -> "TokenizerEncoderConfig":
    """Semantic encoder: vae_dim 128, no sampling
    (reference config.py:72-112)."""
    return TokenizerEncoderConfig(vae_dim=128, fix_std=0.0,
                                  std_dist_type="none")


@dataclass
class Qwen2Config:
    """Qwen2.5-7B decoder config (reference config.py:115-157)."""

    model_type: str = "qwen2"
    vocab_size: int = 152064
    hidden_size: int = 3584
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    intermediate_size: int = 18944
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Qwen2Config":
        return cls(**_filter(cls, d))


@dataclass
class ModelConfig:
    """Main config (reference config.py:160-206)."""

    model_type: str = "vibevoice"
    acoustic_tokenizer_config: TokenizerEncoderConfig = field(
        default_factory=TokenizerEncoderConfig)
    semantic_tokenizer_config: TokenizerEncoderConfig = field(
        default_factory=semantic_defaults)
    decoder_config: Qwen2Config = field(default_factory=Qwen2Config)
    acoustic_vae_dim: int = 64
    semantic_vae_dim: int = 128
    sample_rate: int = 24000
    speech_tok_compress_ratio: int = 3200

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        return cls(
            model_type=d.get("model_type", "vibevoice"),
            acoustic_tokenizer_config=TokenizerEncoderConfig.from_dict(
                d.get("acoustic_tokenizer_config", {})),
            semantic_tokenizer_config=TokenizerEncoderConfig.from_dict(
                {**{"vae_dim": 128, "fix_std": 0.0,
                    "std_dist_type": "none"},
                 **d.get("semantic_tokenizer_config", {})}),
            decoder_config=Qwen2Config.from_dict(
                d.get("decoder_config", {})),
            acoustic_vae_dim=d.get("acoustic_vae_dim", 64),
            semantic_vae_dim=d.get("semantic_vae_dim", 128),
            sample_rate=d.get("sample_rate", 24000),
        )
