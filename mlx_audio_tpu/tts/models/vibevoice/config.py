"""VibeVoice configuration.

Mirrors the reference mlx_audio/tts/models/vibevoice/config.py:10-146.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class AcousticTokenizerConfig:
    """VAE decoder config (reference config.py:10-41)."""

    model_type: str = "vibevoice_acoustic_tokenizer"
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
    decoder_n_filters: int = 32
    decoder_ratios: Optional[Tuple[int, ...]] = None
    decoder_depths: Optional[str] = None


@dataclass
class DiffusionHeadConfig:
    """Diffusion prediction-head config (reference config.py:45-61)."""

    model_type: str = "vibevoice_diffusion_head"
    hidden_size: int = 896
    head_layers: int = 4
    head_ffn_ratio: float = 3.0
    rms_norm_eps: float = 1e-5
    latent_size: int = 64
    prediction_type: str = "v_prediction"
    ddpm_num_steps: int = 1000
    ddpm_num_inference_steps: int = 20
    ddpm_beta_schedule: str = "cosine"


@dataclass
class Qwen2DecoderConfig:
    """Qwen2 backbone config (reference config.py:64-87)."""

    model_type: str = "qwen2"
    hidden_size: int = 896
    intermediate_size: int = 4864
    max_position_embeddings: int = 8192
    num_attention_heads: int = 14
    num_hidden_layers: int = 24
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False
    vocab_size: int = 151936
    head_dim: Optional[int] = None


@dataclass
class ModelConfig:
    """Main VibeVoice config (reference config.py:90-146)."""

    model_type: str = "vibevoice_streaming"
    model_path: Optional[str] = None
    sample_rate: int = 24000
    acoustic_tokenizer_config: AcousticTokenizerConfig = field(
        default_factory=AcousticTokenizerConfig)
    decoder_config: Qwen2DecoderConfig = field(
        default_factory=Qwen2DecoderConfig)
    diffusion_head_config: DiffusionHeadConfig = field(
        default_factory=DiffusionHeadConfig)
    acoustic_vae_dim: int = 64
    tts_backbone_num_hidden_layers: int = 20

    @classmethod
    def from_dict(cls, params: Dict[str, Any]) -> "ModelConfig":
        params = dict(params)

        def sub(key, klass):
            d = params.pop(key, {})
            if isinstance(d, dict):
                names = {f.name for f in klass.__dataclass_fields__.values()}
                return klass(**{k: v for k, v in d.items() if k in names})
            return d

        ac = sub("acoustic_tokenizer_config", AcousticTokenizerConfig)
        dec = sub("decoder_config", Qwen2DecoderConfig)
        dif = sub("diffusion_head_config", DiffusionHeadConfig)
        names = {f.name for f in cls.__dataclass_fields__.values()}
        return cls(acoustic_tokenizer_config=ac, decoder_config=dec,
                   diffusion_head_config=dif,
                   **{k: v for k, v in params.items() if k in names})
