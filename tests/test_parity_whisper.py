"""Offline cross-framework parity: Whisper vs transformers (torch CPU).

Proves the load path (HF torch ``state_dict`` → ``Model.sanitize`` →
``load_weights``) AND the forward math implement the reference semantics
(reference stt/models/whisper/whisper.py:489, utils.py:316 load contract):
a tiny random-init ``transformers.WhisperForConditionalGeneration`` and our
model must produce matching encoder states and decoder logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.stt.models.whisper.whisper import Model, ModelDimensions


def _tiny_hf_whisper():
    cfg = transformers.WhisperConfig(
        vocab_size=120,
        num_mel_bins=16,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,  # whisper always uses 4*d_model
        decoder_ffn_dim=128,
        max_source_positions=40,
        max_target_positions=24,
        decoder_start_token_id=100,
        pad_token_id=99,
        eos_token_id=101,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(cfg).eval()
    return cfg, hf


@pytest.fixture(scope="module")
def whisper_pair():
    cfg, hf = _tiny_hf_whisper()
    dims = ModelDimensions.from_dict(cfg.to_dict())
    model = Model(dims)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    weights = model.sanitize(sd)
    model = load_weights(model, weights, strict=True).eval()
    return cfg, hf, model


def test_encoder_parity(whisper_pair):
    cfg, hf, model = whisper_pair
    rng = np.random.default_rng(0)
    # HF encoder takes (B, n_mels, 2*max_source_positions)
    mel_t = rng.standard_normal(
        (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(mel_t)).last_hidden_state.numpy()
    ours = np.asarray(model.encoder(jnp.asarray(mel_t.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_decoder_logits_parity(whisper_pair):
    cfg, hf, model = whisper_pair
    rng = np.random.default_rng(1)
    mel_t = rng.standard_normal(
        (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_features=torch.from_numpy(mel_t),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()
    xa = model.encoder(jnp.asarray(mel_t.transpose(0, 2, 1)))
    ckv = model.decoder.cross_kv(xa)
    logits, _ = model.decoder(jnp.asarray(tokens, jnp.int32), 0, None, ckv)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4, rtol=1e-4)


def test_incremental_decode_matches_full(whisper_pair):
    """KV-cached step-by-step decode must equal the full-sequence forward."""
    cfg, hf, model = whisper_pair
    rng = np.random.default_rng(2)
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    xa = model.encoder(jnp.asarray(mel))
    ckv = model.decoder.cross_kv(xa)
    full_logits, _ = model.decoder(jnp.asarray(tokens), 0, None, ckv)

    caches = model._make_caches(batch=1)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, caches = model.decoder(jnp.asarray(tokens[:, t : t + 1]), t, caches, ckv)
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=1e-4, rtol=1e-4)
