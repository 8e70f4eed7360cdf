"""LFM2.5-Audio configuration.

Mirrors the reference mlx_audio/sts/models/lfm_audio/config.py:12-191 plus
a local LFM2 backbone config (the reference pulls it from mlx_lm; here the
hybrid conv/attention architecture is implemented natively in lfm2.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class PreprocessorConfig:
    """NeMo-style mel preprocessor (reference config.py:12-36)."""

    sample_rate: int = 16000
    normalize: str = "per_feature"
    window_size: float = 0.025
    window_stride: float = 0.01
    features: int = 128
    n_fft: int = 512
    log: bool = True
    dither: float = 1e-05
    preemph: float = 0.97

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate * self.window_stride)

    @property
    def win_length(self) -> int:
        return int(self.sample_rate * self.window_size)


@dataclass
class ConformerEncoderConfig:
    """FastConformer encoder (reference config.py:39-67)."""

    feat_in: int = 128
    n_layers: int = 17
    d_model: int = 512
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    ff_expansion_factor: int = 4
    n_heads: int = 8
    pos_emb_max_len: int = 5000
    conv_kernel_size: int = 9
    conv_norm_type: str = "batch_norm"
    xscaling: bool = False


@dataclass
class DepthformerConfig:
    """Per-frame codebook transformer (reference config.py:70-78)."""

    layers: int = 6
    dim: int = 1024
    num_heads: int = 32
    num_kv_heads: int = 8
    tie: bool = True


@dataclass
class LFM2Config:
    """Hybrid conv/attention backbone (Liquid LFM2; public architecture —
    gated short-conv layers interleaved with GQA attention layers)."""

    vocab_size: int = 65536
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    intermediate_size: int = 12288
    block_auto_adjust_ff_dim: bool = True
    block_ffn_dim_multiplier: float = 1.0
    block_multiple_of: int = 256
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    conv_L_cache: int = 3
    conv_bias: bool = False
    layer_types: Optional[Tuple[str, ...]] = None
    full_attn_idxs: Tuple[int, ...] = (2, 5, 8, 10, 12, 14)

    def __post_init__(self):
        if self.layer_types is None:
            self.layer_types = tuple(
                "full_attention" if i in tuple(self.full_attn_idxs)
                else "conv" for i in range(self.num_hidden_layers))

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def ffn_dim(self) -> int:
        d = self.intermediate_size
        if self.block_auto_adjust_ff_dim:
            d = int(2 * d / 3)
            d = int(self.block_ffn_dim_multiplier * d)
            m = self.block_multiple_of
            d = m * ((d + m - 1) // m)
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LFM2Config":
        names = {f.name for f in cls.__dataclass_fields__.values()}
        d = {k: v for k, v in d.items() if k in names}
        if "layer_types" in d and d["layer_types"] is not None:
            d["layer_types"] = tuple(d["layer_types"])
        return cls(**d)


@dataclass
class DetokenizerConfig:
    """Mimi-code → waveform detokenizer (reference detokenizer.py:16-60)."""

    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    layer_types: Tuple[str, ...] = (
        "conv", "conv", "sliding_attention", "conv", "sliding_attention",
        "conv", "sliding_attention", "conv")
    sliding_window: int = 30
    intermediate_size: int = 2304
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    output_size: int = 1282
    num_codebooks: int = 8
    vocab_size: int = 2048
    n_fft: int = 1280
    hop_length: int = 320
    upsample_factor: int = 6

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DetokenizerConfig":
        names = {f.name for f in cls.__dataclass_fields__.values()}
        d = {k: v for k, v in d.items() if k in names}
        if "layer_types" in d:
            d["layer_types"] = tuple(d["layer_types"])
        return cls(**d)


@dataclass
class LFM2AudioConfig:
    """Full model config (reference config.py:101-167)."""

    model_type: str = "lfm_audio"
    sample_rate: int = 24000
    codebooks: int = 8
    tie_audio_embeddings: bool = False
    audio_vocab_size: int = 2049  # 2048 + audio EOS
    interleaved_n_text: int = 6
    interleaved_n_audio: int = 12
    preprocessor: PreprocessorConfig = field(
        default_factory=PreprocessorConfig)
    encoder: ConformerEncoderConfig = field(
        default_factory=ConformerEncoderConfig)
    lfm: LFM2Config = field(default_factory=LFM2Config)
    depthformer: DepthformerConfig = field(
        default_factory=DepthformerConfig)
    adapter_hidden_dims: Tuple[int, ...] = (2048,)
    adapter_use_layer_norm: bool = True

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LFM2AudioConfig":
        def sub(key, klass):
            v = d.get(key, {})
            if isinstance(v, dict):
                names = {f.name for f in klass.__dataclass_fields__.values()}
                return klass(**{k: x for k, x in v.items() if k in names})
            return v

        return cls(
            sample_rate=d.get("sample_rate", 24000),
            codebooks=d.get("codebooks", 8),
            audio_vocab_size=d.get("audio_vocab_size", 2049),
            interleaved_n_text=d.get("interleaved_n_text", 6),
            interleaved_n_audio=d.get("interleaved_n_audio", 12),
            preprocessor=sub("preprocessor", PreprocessorConfig),
            encoder=sub("encoder", ConformerEncoderConfig),
            lfm=LFM2Config.from_dict(d.get("lfm", {})),
            depthformer=sub("depthformer", DepthformerConfig),
            adapter_hidden_dims=tuple(d.get("adapter_hidden_dims", (2048,))),
            adapter_use_layer_norm=d.get("adapter_use_layer_norm", True),
        )
