"""Offline cross-framework parity: Voxtral vs transformers (torch CPU).

Tiny random-init ``VoxtralForConditionalGeneration`` → ``state_dict()`` →
``Model.sanitize`` → ``load_weights``; our audio tower + multi-modal
projector must reproduce HF ``get_audio_features``, and the full multimodal
forward (audio embeddings spliced over audio-placeholder tokens) must
reproduce HF logits (reference stt/models/voxtral/voxtral.py behavioral
spec: Encoder :107, MultiModalProjector :147, Model :199).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.stt.models.voxtral.voxtral import Model, ModelConfig, _lm_call

AUDIO_TOKEN = 24
N_MELS = 8
MAX_SRC = 8  # encoder length; mel frames = 2*MAX_SRC


def _tiny_pair():
    torch.manual_seed(11)
    audio_cfg = transformers.models.voxtral.VoxtralEncoderConfig(
        vocab_size=51866,
        hidden_size=16,
        intermediate_size=64,  # ffn dim AND 4-frame stack dim (4*hidden)
        num_hidden_layers=2,
        num_attention_heads=4,
        num_mel_bins=N_MELS,
        max_source_positions=MAX_SRC,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=130,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    hf_cfg = transformers.VoxtralConfig(
        audio_config=audio_cfg, text_config=text_cfg, audio_token_id=AUDIO_TOKEN
    )
    hf = transformers.VoxtralForConditionalGeneration(hf_cfg).eval()

    cfg = ModelConfig.from_dict(
        dict(
            audio_config=dict(
                num_mel_bins=N_MELS,
                d_model=16,
                encoder_layers=2,
                encoder_attention_heads=4,
                encoder_ffn_dim=64,
                intermediate_size=64,
                max_source_positions=MAX_SRC,
            ),
            text_config={**text_cfg.to_dict(), "model_type": "llama"},
            audio_token_id=AUDIO_TOKEN,
        )
    )
    model = Model(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = load_weights(model, model.sanitize(sd), strict=True).eval()
    return hf, model


@pytest.fixture(scope="module")
def voxtral_pair():
    return _tiny_pair()


def _mel(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, N_MELS, 2 * MAX_SRC)).astype(np.float32)


def test_audio_features_parity(voxtral_pair):
    hf, model = voxtral_pair
    mel = _mel(0)
    with torch.no_grad():
        ref = hf.get_audio_features(torch.from_numpy(mel)).numpy()
    ours = np.asarray(model.get_audio_embeds(jnp.asarray(mel.transpose(0, 2, 1))))
    assert ours.shape == (1,) + ref.shape
    np.testing.assert_allclose(ours[0], ref, atol=1e-4, rtol=1e-4)


def test_multimodal_logits_parity(voxtral_pair):
    hf, model = voxtral_pair
    mel = _mel(1)
    n_audio = (2 * MAX_SRC // 2) // 4  # conv2 stride 2, then 4-frame stacking
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 120, size=(1, n_audio + 5)).astype(np.int64)
    ids[ids == AUDIO_TOKEN] = 0
    ids[0, 2 : 2 + n_audio] = AUDIO_TOKEN

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(mel),
        ).logits.numpy()

    audio_emb = model.get_audio_embeds(jnp.asarray(mel.transpose(0, 2, 1)))
    emb = np.asarray(model.language_model.model.embed_tokens(jnp.asarray(ids)))
    emb[0, 2 : 2 + n_audio] = np.asarray(audio_emb)[0]
    logits, _ = _lm_call(model.language_model, jnp.asarray(emb), None)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-4)
