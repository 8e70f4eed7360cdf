"""Convert NVIDIA NeMo Sortformer diarization checkpoints (.nemo) to this
framework's safetensors + config.json.

Behavioral spec: reference vad/models/sortformer/convert.py (529 LoC) — the
NeMo→key mapping is fixed by the two module hierarchies, so the rename
table is necessarily the same; layouts are transposed to our channels-last
conv convention and the transformer's sinusoidal position table is
materialized (NeMo computes it at runtime).

Usage:
    python -m mlx_audio_tpu.vad.models.sortformer.convert \
        --nemo-path nvidia/diar_streaming_sortformer_4spk-v2.1 \
        --output-dir ./sortformer-v2.1 [--upload <hf-repo>]
"""

from __future__ import annotations

import argparse
import io
import math
import tarfile
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_SKIP_SUBSTRINGS = ("num_batches_tracked", "preprocessor")

_FC_RENAMES = {
    "self_attn.linear_q.": "self_attn.q_proj.",
    "self_attn.linear_k.": "self_attn.k_proj.",
    "self_attn.linear_v.": "self_attn.v_proj.",
    "self_attn.linear_out.": "self_attn.o_proj.",
    "self_attn.linear_pos.": "self_attn.relative_k_proj.",
    "self_attn.pos_bias_u": "self_attn.bias_u",
    "self_attn.pos_bias_v": "self_attn.bias_v",
    "conv.batch_norm.": "conv.norm.",
}

_TF_RENAMES = {
    "first_sub_layer.query_net.": "self_attn.q_proj.",
    "first_sub_layer.key_net.": "self_attn.k_proj.",
    "first_sub_layer.value_net.": "self_attn.v_proj.",
    "first_sub_layer.out_projection.": "self_attn.out_proj.",
    "second_sub_layer.dense_in.": "fc1.",
    "second_sub_layer.dense_out.": "fc2.",
    "layer_norm_1.": "self_attn_layer_norm.",
    "layer_norm_2.": "final_layer_norm.",
}


def _rename(key: str, table: dict) -> str:
    for old, new in table.items():
        key = key.replace(old, new)
    return key


def remap_key(nemo_key: str) -> Optional[str]:
    """NeMo state-dict key → our parameter path (None = drop)."""
    if any(sub in nemo_key for sub in _SKIP_SUBSTRINGS):
        return None
    if nemo_key.startswith("encoder.pre_encode.conv."):
        return nemo_key.replace("encoder.pre_encode.conv.",
                                "fc_encoder.subsampling.layers_")
    if nemo_key.startswith("encoder.pre_encode.out."):
        return nemo_key.replace("encoder.pre_encode.out.",
                                "fc_encoder.subsampling.linear.")
    if nemo_key.startswith("encoder.layers."):
        return _rename(nemo_key.replace("encoder.layers.",
                                        "fc_encoder.layers."), _FC_RENAMES)
    if nemo_key.startswith("transformer_encoder."):
        return _rename(nemo_key.replace("transformer_encoder.",
                                        "tf_encoder."), _TF_RENAMES)
    if nemo_key.startswith("sortformer_modules."):
        return nemo_key
    return None


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos table (NeMo TransformerEmbedding convention)."""
    pe = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def convert_weights(state_dict: dict) -> Tuple[Dict[str, np.ndarray], list]:
    """Remap keys and reorient conv tensors to channels-last.

    torch Conv2d (O, I, H, W) → (O, H, W, I); torch Conv1d (O, I, K) →
    (O, K, I) for the pointwise/depthwise conformer convs.
    """
    out: Dict[str, np.ndarray] = {}
    skipped = []
    for k, t in state_dict.items():
        key = remap_key(k)
        if key is None:
            if not any(sub in k for sub in _SKIP_SUBSTRINGS):
                skipped.append(k)
            continue
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        if key.endswith(".weight"):
            if arr.ndim == 4 and ".subsampling.layers_" in key:
                arr = arr.transpose(0, 2, 3, 1)
            elif arr.ndim == 3 and any(n in key for n in (
                    "pointwise_conv1", "pointwise_conv2", "depthwise_conv")):
                arr = arr.transpose(0, 2, 1)
        out[key] = arr
    return out, skipped


def build_config(yaml_cfg: dict) -> dict:
    """NeMo model_config.yaml → our ModelConfig dict (config.py fields)."""
    enc = yaml_cfg.get("encoder", {})
    tf = yaml_cfg.get("transformer_encoder", {})
    sm = yaml_cfg.get("sortformer_modules", {})
    pp = yaml_cfg.get("preprocessor", {})
    sample_rate = pp.get("sample_rate", 16000)
    return {
        "model_type": "sortformer",
        "num_speakers": sm.get("num_spks", 4),
        "dtype": "float32",
        "fc_encoder_config": {
            "hidden_size": enc.get("d_model", 512),
            "num_hidden_layers": enc.get("n_layers", 18),
            "num_attention_heads": enc.get("n_heads", 8),
            "intermediate_size": enc.get("d_model", 512) * enc.get(
                "ff_expansion_factor", 4),
            "num_mel_bins": pp.get("features", 128),
            "conv_kernel_size": enc.get("conv_kernel_size", 9),
            "subsampling_factor": enc.get("subsampling_factor", 8),
            "subsampling_conv_channels": enc.get(
                "subsampling_conv_channels", 256),
            "scale_input": enc.get("xscaling", True),
        },
        "tf_encoder_config": {
            "d_model": tf.get("hidden_size", 192),
            "encoder_layers": tf.get("num_layers", 18),
            "encoder_attention_heads": tf.get("num_attention_heads", 8),
            "encoder_ffn_dim": tf.get("inner_size", 768),
            "max_source_positions": tf.get("max_sequence_length", 1500),
            "k_proj_bias": True,  # NeMo key_net carries a bias
        },
        "modules_config": {
            "num_speakers": sm.get("num_spks", 4),
            "fc_d_model": sm.get("fc_d_model", 512),
            "tf_d_model": sm.get("tf_d_model", 192),
            "subsampling_factor": enc.get("subsampling_factor", 8),
            "chunk_len": sm.get("chunk_len", 188),
            "fifo_len": sm.get("fifo_len", 0),
            "spkcache_len": sm.get("spkcache_len", 188),
            "spkcache_update_period": sm.get("spkcache_update_period", 188),
            "chunk_left_context": sm.get("chunk_left_context", 1),
            "chunk_right_context": sm.get("chunk_right_context", 1),
            "spkcache_sil_frames_per_spk": sm.get(
                "spkcache_sil_frames_per_spk", 5),
            "scores_boost_latest": sm.get("scores_boost_latest", 0.5),
            "sil_threshold": sm.get("sil_threshold", 0.1),
            "pred_score_threshold": sm.get("pred_score_threshold", 1e-6),
            "strong_boost_rate": sm.get("strong_boost_rate", 0.3),
            "weak_boost_rate": sm.get("weak_boost_rate", 0.7),
            "min_pos_scores_rate": sm.get("min_pos_scores_rate", 0.5),
            "use_aosc": pp.get("normalize", "per_feature") in (
                "NA", "None", None, "null"),
        },
        "processor_config": {
            "feature_size": pp.get("features", 128),
            "sampling_rate": sample_rate,
            "hop_length": int(pp.get("window_stride", 0.01) * sample_rate),
            "n_fft": pp.get("n_fft", 512),
            "win_length": int(pp.get("window_size", 0.025) * sample_rate),
            "preemphasis": pp.get("preemph", 0.97),
        },
    }


def extract_nemo(nemo_path: Path) -> Tuple[dict, dict]:
    """(yaml_config, torch_state_dict) from a .nemo tarball."""
    import torch
    import yaml

    yaml_cfg = state = None
    with tarfile.open(nemo_path, "r:*") as tar:
        for member in tar.getmembers():
            name = member.name.rsplit("/", 1)[-1]
            if name == "model_config.yaml":
                yaml_cfg = yaml.safe_load(tar.extractfile(member))
            elif name == "model_weights.ckpt":
                buf = io.BytesIO(tar.extractfile(member).read())
                state = torch.load(buf, map_location="cpu",
                                   weights_only=True)
    if yaml_cfg is None or state is None:
        raise ValueError(
            f"{nemo_path}: missing model_config.yaml or model_weights.ckpt")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return yaml_cfg, state


def convert(nemo_path: str, output_dir: str,
            upload_repo: Optional[str] = None) -> Path:
    from ....convert import save_model

    path = Path(nemo_path)
    if not path.exists():  # HF repo id holding the .nemo file
        from huggingface_hub import hf_hub_download

        path = Path(hf_hub_download(
            repo_id=nemo_path, filename=nemo_path.split("/")[-1] + ".nemo"))
    yaml_cfg, state = extract_nemo(path)
    weights, skipped = convert_weights(state)
    config = build_config(yaml_cfg)
    tf = config["tf_encoder_config"]
    weights["tf_encoder.embed_positions.weight"] = sinusoidal_positions(
        tf["max_source_positions"], tf["d_model"])
    out = Path(output_dir)
    save_model(out, weights, config)
    for k in skipped:
        print(f"  skipped unknown key: {k}")
    print(f"✓ converted {nemo_path} → {out} ({len(weights)} tensors)")
    if upload_repo:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(upload_repo, exist_ok=True)
        api.upload_folder(folder_path=str(out), repo_id=upload_repo)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert NeMo Sortformer .nemo → native checkpoint")
    p.add_argument("--nemo-path", required=True,
                   help=".nemo file or HF repo id containing one")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--upload", default=None, help="HF repo to upload to")
    args = p.parse_args(argv)
    convert(args.nemo_path, args.output_dir, args.upload)


if __name__ == "__main__":
    main()
