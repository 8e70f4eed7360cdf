"""Offline cross-framework parity: EnCodec vs transformers (torch CPU).

Tiny random-init ``transformers.EncodecModel`` → ``state_dict()`` →
``sanitize`` → ``load_weights``: encoder embeddings, RVQ codes, and decoded
waveforms must match (reference codec/models/encodec/encodec.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.codec.models.encodec.encodec import Encodec, EncodecConfig
from mlx_audio_tpu.nn.module import load_weights


@pytest.fixture(scope="module")
def encodec_pair():
    cfg = transformers.EncodecConfig(
        target_bandwidths=[1.5, 3.0],
        sampling_rate=24000,
        audio_channels=1,
        normalize=False,
        num_filters=8,
        hidden_size=16,
        num_residual_layers=1,
        upsampling_ratios=[8, 5, 4, 2],
        codebook_size=64,
        codebook_dim=16,
        num_lstm_layers=2,
    )
    torch.manual_seed(21)
    hf = transformers.EncodecModel(cfg).eval()
    ours = Encodec(EncodecConfig.from_dict(cfg.to_dict()))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = load_weights(ours, ours.sanitize(sd), strict=True).eval()
    return cfg, hf, ours


def test_codes_parity(encodec_pair):
    cfg, hf, ours = encodec_pair
    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal((1, 1, 3200))).astype(np.float32)
    with torch.no_grad():
        ref_codes = hf.encode(torch.from_numpy(audio), bandwidth=3.0).audio_codes
    codes, _ = ours.encode(jnp.asarray(audio), bandwidth=3.0)
    assert np.array_equal(np.asarray(codes), ref_codes.numpy())


def test_roundtrip_waveform_parity(encodec_pair):
    cfg, hf, ours = encodec_pair
    rng = np.random.default_rng(6)
    audio = (0.1 * rng.standard_normal((1, 1, 3200))).astype(np.float32)
    with torch.no_grad():
        enc = hf.encode(torch.from_numpy(audio), bandwidth=1.5)
        ref = hf.decode(enc.audio_codes, enc.audio_scales).audio_values.numpy()
    codes, scales = ours.encode(jnp.asarray(audio), bandwidth=1.5)
    out = np.asarray(ours.decode(codes, scales))
    np.testing.assert_allclose(out, ref[..., : out.shape[-1]], atol=1e-4, rtol=1e-4)
