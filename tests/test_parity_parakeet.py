"""Offline cross-framework parity: Parakeet FastConformer-CTC vs
transformers (torch CPU).

Tiny random-init ``ParakeetForCTC`` → ``state_dict()`` → key/layout map →
our ``ParakeetCTC`` must reproduce CTC logits (reference
stt/models/parakeet/conformer.py + ctc.py behavioral spec; transformers'
port is output-equivalent to NVIDIA NeMo, which the reference follows).

This proves the FastConformer encoder math — depthwise-striding 2D
subsampling, relative-position attention with pos_bias_u/v, the GLU conv
module with BatchNorm — shared by Parakeet TDT/RNNT/CTC and Sortformer.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.stt.models.parakeet.conformer import Conformer, ConformerArgs
from mlx_audio_tpu.stt.models.parakeet.ctc import ConvASRDecoder, ConvASRDecoderArgs

MEL = 80  # must divide by 2 at each subsampling stage (HF linear sizing)
DIM = 32
VOCAB = 39  # + blank = HF vocab_size 40


def _hf_model(seed: int):
    torch.manual_seed(seed)
    enc_cfg = transformers.ParakeetEncoderConfig(
        hidden_size=DIM,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_kernel_size=9,
        subsampling_conv_channels=16,
        num_mel_bins=MEL,
        subsampling_factor=8,
        dropout=0.0,
        attention_dropout=0.0,
        dropout_positions=0.0,
    )
    cfg = transformers.ParakeetCTCConfig(
        encoder_config=enc_cfg.to_dict(), vocab_size=VOCAB + 1)
    return transformers.ParakeetForCTC(cfg).eval()


def _map_weights(sd: dict) -> dict:
    """HF ParakeetForCTC keys → our ParakeetCTC keys (channels-last)."""
    out = {}
    # HF nn.Sequential indices (ReLU at 1, 4, 7, ...) → our conv-list index
    sub_map = {"0": "0", "2": "1", "3": "2", "5": "3", "6": "4"}
    for k, v in sd.items():
        v = v.detach().numpy()
        if k.endswith("num_batches_tracked"):
            continue
        parts = k.split(".")
        if k.startswith("encoder.subsampling.layers."):
            j = sub_map[parts[3]]
            out[f"encoder.pre_encode.conv.{j}.{parts[4]}"] = (
                v.transpose(0, 2, 3, 1) if v.ndim == 4 else v)
        elif k.startswith("encoder.subsampling.linear."):
            out[f"encoder.pre_encode.out.{parts[3]}"] = v
        elif k == "ctc_head.weight":
            out["decoder.decoder_layers.0.weight"] = v.transpose(0, 2, 1)
        elif k == "ctc_head.bias":
            out["decoder.decoder_layers.0.bias"] = v
        elif ".self_attn." in k:
            rename = {
                "q_proj": "linear_q", "k_proj": "linear_k",
                "v_proj": "linear_v", "o_proj": "linear_out",
                "relative_k_proj": "linear_pos",
                "bias_u": "pos_bias_u", "bias_v": "pos_bias_v",
            }
            parts[4] = rename[parts[4]]
            out[".".join(parts)] = v
        elif ".conv." in k and parts[4] in (
                "pointwise_conv1", "pointwise_conv2", "depthwise_conv"):
            out[".".join(parts)] = (
                v.transpose(0, 2, 1) if v.ndim == 3 else v)
        elif ".conv.norm." in k:
            parts[4] = "batch_norm"
            out[".".join(parts)] = v
        else:
            out[k] = v
    return out


class _OurCTC:
    def __init__(self, weights):
        class M:
            pass

        from mlx_audio_tpu.nn.module import Module

        class Wrapper(Module):
            def __init__(self):
                self.encoder = Conformer(ConformerArgs(
                    feat_in=MEL, n_layers=2, d_model=DIM, n_heads=4,
                    ff_expansion_factor=2, subsampling_factor=8,
                    conv_kernel_size=9, subsampling_conv_channels=16,
                    xscaling=True,  # HF scale_input default
                ))
                self.decoder = ConvASRDecoder(ConvASRDecoderArgs(
                    feat_in=DIM, num_classes=VOCAB))

        self.model = load_weights(Wrapper(), weights, strict=True).eval()

    def logits(self, mel: np.ndarray) -> np.ndarray:
        feats, _ = self.model.encoder(jnp.asarray(mel))
        return np.asarray(self.model.decoder(feats))


def test_ctc_logits_parity():
    hf = _hf_model(23)
    ours = _OurCTC(_map_weights(hf.state_dict()))

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 64, MEL)).astype(np.float32)
    with torch.no_grad():
        # ours follows NeMo's ConvASRDecoder (log-softmax outputs); HF
        # returns raw logits — normalize both to log-probs
        ref = hf(input_features=torch.from_numpy(mel)).logits
        ref = torch.log_softmax(ref, dim=-1).numpy()
    got = ours.logits(mel)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_ctc_logits_parity_batch_and_longer():
    hf = _hf_model(31)
    ours = _OurCTC(_map_weights(hf.state_dict()))

    rng = np.random.default_rng(9)
    mel = rng.standard_normal((2, 120, MEL)).astype(np.float32)
    with torch.no_grad():
        ref = torch.log_softmax(
            hf(input_features=torch.from_numpy(mel)).logits, dim=-1).numpy()
    got = ours.logits(mel)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
