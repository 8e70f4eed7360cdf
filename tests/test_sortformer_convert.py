"""NeMo → native Sortformer converter round trip.

Builds a tiny native model, exports its weights under NeMo naming/layout
into a synthetic .nemo tarball (model_config.yaml + torch model_weights.
ckpt), runs the converter, and asserts every tensor round-trips exactly and
the converted checkpoint loads and diarizes end-to-end."""

import io
import tarfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

import jax.tree_util as jtu

from mlx_audio_tpu.nn.module import path_str
from mlx_audio_tpu.vad.models.sortformer import Model, ModelConfig
from mlx_audio_tpu.vad.models.sortformer.convert import (
    convert,
    remap_key,
    sinusoidal_positions,
)

_INV_FC = {
    "self_attn.q_proj.": "self_attn.linear_q.",
    "self_attn.k_proj.": "self_attn.linear_k.",
    "self_attn.v_proj.": "self_attn.linear_v.",
    "self_attn.o_proj.": "self_attn.linear_out.",
    "self_attn.relative_k_proj.": "self_attn.linear_pos.",
    "self_attn.bias_u": "self_attn.pos_bias_u",
    "self_attn.bias_v": "self_attn.pos_bias_v",
    "conv.norm.": "conv.batch_norm.",
}
_INV_TF = {
    "self_attn.q_proj.": "first_sub_layer.query_net.",
    "self_attn.k_proj.": "first_sub_layer.key_net.",
    "self_attn.v_proj.": "first_sub_layer.value_net.",
    "self_attn.out_proj.": "first_sub_layer.out_projection.",
    "fc1.": "second_sub_layer.dense_in.",
    "fc2.": "second_sub_layer.dense_out.",
    "self_attn_layer_norm.": "layer_norm_1.",
    "final_layer_norm.": "layer_norm_2.",
}


def _to_nemo_key(key):
    if key.startswith("fc_encoder.subsampling.layers_"):
        return key.replace("fc_encoder.subsampling.layers_",
                           "encoder.pre_encode.conv.")
    if key.startswith("fc_encoder.subsampling.linear."):
        return key.replace("fc_encoder.subsampling.linear.",
                           "encoder.pre_encode.out.")
    if key.startswith("fc_encoder.layers."):
        key = key.replace("fc_encoder.layers.", "encoder.layers.")
        for new, old in _INV_FC.items():
            key = key.replace(new, old)
        return key
    if key.startswith("tf_encoder.embed_positions"):
        return None  # NeMo computes positions at runtime
    if key.startswith("tf_encoder.layers."):
        key = key.replace("tf_encoder.layers.", "transformer_encoder.layers.")
        for new, old in _INV_TF.items():
            key = key.replace(new, old)
        return key
    return key  # sortformer_modules.*


def _tiny_model():
    return Model(ModelConfig.from_dict(dict(
        num_speakers=4,
        fc_encoder_config=dict(hidden_size=64, num_hidden_layers=1,
                               num_attention_heads=4, intermediate_size=128,
                               num_mel_bins=32, conv_kernel_size=9,
                               subsampling_conv_channels=16),
        tf_encoder_config=dict(d_model=48, encoder_layers=1,
                               encoder_attention_heads=4, encoder_ffn_dim=96,
                               max_source_positions=256, k_proj_bias=True),
        modules_config=dict(num_speakers=4, fc_d_model=64, tf_d_model=48),
        processor_config=dict(feature_size=32),
    )))


def test_nemo_roundtrip(tmp_path):
    m = _tiny_model()
    leaves, _ = jtu.tree_flatten_with_path(m)
    native = {path_str(p): np.asarray(v) for p, v in leaves
              if hasattr(v, "shape")}

    # export under NeMo naming + torch layouts
    state = {}
    for k, v in native.items():
        nk = _to_nemo_key(k)
        if nk is None:
            continue
        if k.endswith(".weight"):
            if v.ndim == 4 and ".subsampling.layers_" in k:
                v = v.transpose(0, 3, 1, 2)  # (O,H,W,I) → (O,I,H,W)
            elif v.ndim == 3 and any(n in k for n in (
                    "pointwise_conv1", "pointwise_conv2", "depthwise_conv")):
                v = v.transpose(0, 2, 1)  # (O,K,I) → (O,I,K)
        state[nk] = torch.from_numpy(np.ascontiguousarray(v))
    state["encoder.layers.0.conv.batch_norm.num_batches_tracked"] = (
        torch.tensor(0)
    )
    state["preprocessor.featurizer.window"] = torch.zeros(4)

    cfg_yaml = dict(
        encoder=dict(d_model=64, n_layers=1, n_heads=4,
                     ff_expansion_factor=2, conv_kernel_size=9,
                     subsampling_factor=8, subsampling_conv_channels=16,
                     xscaling=True),
        transformer_encoder=dict(hidden_size=48, num_layers=1,
                                 num_attention_heads=4, inner_size=96,
                                 max_sequence_length=256),
        sortformer_modules=dict(num_spks=4, fc_d_model=64, tf_d_model=48),
        preprocessor=dict(sample_rate=16000, features=32,
                          window_size=0.025, window_stride=0.01, n_fft=512,
                          normalize="NA"),
    )

    nemo = tmp_path / "tiny.nemo"
    with tarfile.open(nemo, "w") as tar:
        y = yaml.safe_dump(cfg_yaml).encode()
        info = tarfile.TarInfo("model_config.yaml")
        info.size = len(y)
        tar.addfile(info, io.BytesIO(y))
        buf = io.BytesIO()
        torch.save(state, buf)
        data = buf.getvalue()
        info = tarfile.TarInfo("model_weights.ckpt")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    out = convert(str(nemo), str(tmp_path / "converted"))

    from mlx_audio_tpu.utils import load_weight_files

    converted = load_weight_files(out)
    # every native tensor round-trips exactly (positions are regenerated)
    for k, v in native.items():
        if k == "tf_encoder.embed_positions.weight":
            np.testing.assert_allclose(
                converted[k], sinusoidal_positions(256, 48), atol=1e-6)
            continue
        np.testing.assert_array_equal(converted[k], v, err_msg=k)
    assert set(converted) == set(native)

    # converted checkpoint loads through the registry and diarizes
    from mlx_audio_tpu.vad.utils import load_model

    loaded = load_model(out)
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    res = loaded.generate(audio)
    assert res.speaker_probs is not None


def test_remap_skips_and_maps():
    assert remap_key("preprocessor.featurizer.window") is None
    assert remap_key("encoder.layers.3.self_attn.linear_q.weight") == \
        "fc_encoder.layers.3.self_attn.q_proj.weight"
    assert remap_key("transformer_encoder.layers.0.first_sub_layer.key_net.bias") == \
        "tf_encoder.layers.0.self_attn.k_proj.bias"
