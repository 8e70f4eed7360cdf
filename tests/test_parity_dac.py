"""Offline cross-framework parity: DAC vs transformers (torch CPU).

Tiny random-init ``transformers.DacModel`` → ``state_dict()`` → ``sanitize``
→ ``load_weights``: RVQ codes and decoded waveforms must match (reference
codec/models/descript/dac.py, utils.py:316 load contract).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.codec.models.descript.dac import DAC
from mlx_audio_tpu.nn.module import load_weights


@pytest.fixture(scope="module")
def dac_pair():
    cfg = transformers.DacConfig(
        encoder_hidden_size=16,
        downsampling_ratios=[2, 4, 4],
        decoder_hidden_size=16,
        upsampling_ratios=[4, 4, 2],
        n_codebooks=4,
        codebook_size=32,
        codebook_dim=4,
        hidden_size=32,
        hop_length=32,
        sampling_rate=16000,
    )
    torch.manual_seed(11)
    hf = transformers.DacModel(cfg).eval()
    ours = DAC(
        encoder_dim=cfg.encoder_hidden_size,
        encoder_rates=list(cfg.downsampling_ratios),
        latent_dim=cfg.hidden_size,
        decoder_dim=cfg.decoder_hidden_size,
        decoder_rates=list(cfg.upsampling_ratios),
        n_codebooks=cfg.n_codebooks,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        sample_rate=cfg.sampling_rate,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = load_weights(ours, ours.sanitize(sd), strict=True).eval()
    return cfg, hf, ours


def test_codes_parity(dac_pair):
    cfg, hf, ours = dac_pair
    rng = np.random.default_rng(7)
    audio = (0.1 * rng.standard_normal((1, 1, 2 * 32 * 10))).astype(np.float32)
    with torch.no_grad():
        ref = hf.encode(torch.from_numpy(audio))
    _, codes, _, _, _ = ours.encode(jnp.asarray(audio))
    assert np.array_equal(np.asarray(codes), ref.audio_codes.numpy())


def test_roundtrip_waveform_parity(dac_pair):
    cfg, hf, ours = dac_pair
    rng = np.random.default_rng(8)
    audio = (0.1 * rng.standard_normal((1, 1, 2 * 32 * 10))).astype(np.float32)
    with torch.no_grad():
        enc = hf.encode(torch.from_numpy(audio))
        ref = hf.decode(enc.quantized_representation).audio_values.numpy()
    z, codes, _, _, _ = ours.encode(jnp.asarray(audio))
    out = np.asarray(ours.decode(z))[:, 0]
    n = min(out.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(out[..., :n], ref[..., :n], atol=1e-4, rtol=1e-4)


def test_decode_codes_matches_decode_z(dac_pair):
    """`decode_codes` (from integer codes) must equal `decode(z_q)`."""
    cfg, hf, ours = dac_pair
    rng = np.random.default_rng(9)
    audio = (0.1 * rng.standard_normal((1, 1, 32 * 8))).astype(np.float32)
    z, codes, _, _, _ = ours.encode(jnp.asarray(audio))
    a1 = np.asarray(ours.decode(z))
    a2 = np.asarray(ours.decode_codes(codes))
    np.testing.assert_allclose(a1, a2, atol=1e-5, rtol=1e-5)
