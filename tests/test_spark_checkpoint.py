"""Spark BiCodec checkpoint loading: reference-layout safetensors +
config.yaml → load_bicodec → working detokenize.

The published Spark-TTS checkpoints ship the codec as
`<repo>/BiCodec/{config.yaml,model.safetensors}` in the reference's module
tree (reference bicodec.py:92-135: WN-conv g/v pairs, nn.Sequential
`.layers.N` wrappers, flat WaveGenerator `model.N` list, channels-first
Snake alphas). This test synthesises that layout for a tiny config by
inverse-mapping our module tree, then asserts `load_bicodec` reproduces
the exact parameters and runs.
"""

import numpy as np
import pytest

yaml = pytest.importorskip("yaml")

TINY_CFG = {
    "audio_tokenizer": {
        "mel_params": {
            "sample_rate": 16000, "n_fft": 256, "win_length": 160,
            "hop_length": 80, "mel_fmin": 10, "num_mels": 128,
        },
        "encoder": {
            "input_channels": 16, "vocos_dim": 16,
            "vocos_intermediate_dim": 32, "vocos_num_layers": 1,
            "out_channels": 8, "sample_ratios": [2],
        },
        "decoder": {
            "input_channel": 16, "channels": 16, "rates": [4, 2],
            "kernel_sizes": [8, 4],
        },
        "quantizer": {
            "input_dim": 8, "codebook_size": 32, "codebook_dim": 4,
            "commitment": 0.25,
        },
        "speaker_encoder": {
            "input_dim": 128, "out_dim": 16, "latent_dim": 8,
            "token_num": 4, "fsq_levels": [4, 4], "fsq_num_quantizers": 1,
            "ecapa_channels": 8,
        },
        "prenet": {
            "input_channels": 8, "vocos_dim": 16,
            "vocos_intermediate_dim": 32, "vocos_num_layers": 1,
            "out_channels": 16, "condition_dim": 16, "sample_ratios": [2],
        },
        "postnet": {
            "input_channels": 16, "vocos_dim": 16,
            "vocos_intermediate_dim": 32, "vocos_num_layers": 1,
            "out_channels": 16,
        },
    }
}

# keys that are weight-normed convs in the reference layout
_WN_CONV_SUFFIXES = ("conv_in.weight", "conv_out.weight",
                     "in_project.weight", "out_project.weight")


def _is_wn_transpose(key: str) -> bool:
    # ConvTranspose1d sites: SamplingBlock upsampler + DecoderBlock index 1
    if "de_conv_upsampler.weight" in key:
        return True
    parts = key.split(".")
    return ("blocks" in parts and parts[-2] == "1"
            and parts[-1] == "weight" and "block" not in parts[-3:-2])


def _wn_split(w, transpose: bool):
    w = np.asarray(w, np.float32)
    if transpose:  # normalize over all but the input-channel axis (2)
        norm = np.sqrt((w * w).sum(axis=(0, 1), keepdims=True))
    else:  # normalize over all but the output-channel axis (0)
        norm = np.sqrt((w * w).sum(axis=(1, 2), keepdims=True))
    g = np.maximum(norm, 1e-12)
    return g, w / g


def _to_reference_layout(ours: dict, n_rates: int) -> dict:
    """Inverse of BiCodec.sanitize for the tiny test tree."""
    out = {}
    for k, v in ours.items():
        v = np.asarray(v)
        # WaveGenerator named attrs → flat model.N list
        if k.startswith("decoder.conv_in."):
            k = k.replace("decoder.conv_in.", "decoder.model.0.")
        elif k.startswith("decoder.blocks."):
            parts = k.split(".")
            i = int(parts[2])
            rest = ".".join(parts[3:])
            rest = rest.replace("block.", "block.layers.")  # ResidualUnit
            k = f"decoder.model.{i + 1}.block.layers.{rest}"
        elif k.startswith("decoder.snake_out."):
            k = k.replace("decoder.snake_out.",
                          f"decoder.model.{n_rates + 1}.")
        elif k.startswith("decoder.conv_out."):
            k = k.replace("decoder.conv_out.",
                          f"decoder.model.{n_rates + 2}.")
        else:
            k = k.replace(".block.", ".block.layers.") if \
                ".block." in k and "se_res2block" not in k else k
        # Sequential wrappers around the sampling convs
        k = k.replace("conv_downsampler.", "conv_downsampler.layers.1.")
        k = k.replace("de_conv_upsampler.", "de_conv_upsampler.layers.1.")
        # RMSNorm gamma naming
        if k.endswith("perceiver_sampler.norm.weight"):
            k = k[: -len("weight")] + "gamma"
        # channels-first Snake alphas
        if k.endswith(".alpha") and v.ndim == 3:
            v = v.transpose(0, 2, 1)
        # split WN pairs
        wn = any(k.endswith(s) for s in _WN_CONV_SUFFIXES) or \
            ".block.layers." in k and k.endswith(".weight") and v.ndim == 3 \
            or "de_conv_upsampler" in k and k.endswith(".weight")
        if wn and v.ndim == 3:
            g, vv = _wn_split(v, _is_wn_transpose(k))
            out[k[: -len("weight")] + "weight_g"] = g
            out[k[: -len("weight")] + "weight_v"] = vv
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def bicodec_ckpt(tmp_path_factory):
    from safetensors.numpy import save_file

    from mlx_audio_tpu.nn.module import flatten_params
    from mlx_audio_tpu.tts.models.spark import spark as S

    d = tmp_path_factory.mktemp("bicodec")
    (d / "config.yaml").write_text(yaml.safe_dump(TINY_CFG))

    cfg = TINY_CFG["audio_tokenizer"]
    bc = S.BiCodec(
        encoder=S.FeatEncoder(**{k: v for k, v in cfg["encoder"].items()}),
        decoder=S.WaveGenerator(**cfg["decoder"]),
        quantizer=S.FactorizedVectorQuantize(**cfg["quantizer"]),
        speaker_encoder=S.SpeakerEncoder(**cfg["speaker_encoder"]),
        prenet=S.FeatDecoder(**cfg["prenet"]),
        postnet=S.FeatDecoder(**cfg["postnet"]),
    )
    ours = {k: np.asarray(v) for k, v in flatten_params(bc).items()}
    ref = _to_reference_layout(ours, n_rates=len(cfg["decoder"]["rates"]))
    # buffers the published file carries that must be skipped gracefully
    ref["speaker_encoder.quantizer.layers.0._levels"] = np.asarray(
        cfg["speaker_encoder"]["fsq_levels"], np.int32)
    ref["speaker_encoder.quantizer.layers.0._implicit_codebook"] = np.zeros(
        (16, 2), np.float32)
    save_file({k: np.ascontiguousarray(v) for k, v in ref.items()},
              str(d / "model.safetensors"))
    return d, ours


def test_load_bicodec_exact_params(bicodec_ckpt):
    from mlx_audio_tpu.nn.module import flatten_params
    from mlx_audio_tpu.tts.models.spark.spark import load_bicodec

    d, ours = bicodec_ckpt
    bc = load_bicodec(d)
    loaded = flatten_params(bc)
    assert set(loaded) == set(ours)
    for k in ours:
        np.testing.assert_allclose(
            np.asarray(loaded[k], np.float32),
            np.asarray(ours[k], np.float32), rtol=2e-5, atol=2e-6,
            err_msg=k)


def test_loaded_bicodec_runs(bicodec_ckpt):
    import jax

    from mlx_audio_tpu.tts.models.spark.spark import load_bicodec

    d, _ = bicodec_ckpt
    bc = load_bicodec(d)
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((1, 20, 16), np.float32)
    ref_wav = rng.standard_normal((1, 1600), np.float32) * 0.1
    semantic, global_tokens = bc.tokenize(feat, ref_wav)
    wav = bc.detokenize(np.asarray(semantic), np.asarray(global_tokens))
    wav = np.asarray(jax.device_get(wav))
    assert wav.ndim == 2 and wav.shape[1] > 0
    assert np.all(np.isfinite(wav))
