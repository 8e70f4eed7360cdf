"""Echo-TTS: byte tokenizer, DiT CFG sampler, fish-codec latent bridge."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.echo_tts import (
    EchoDiTConfig,
    Model,
    ModelConfig,
    PCAState,
    SamplerConfig,
    normalize_text_prompt,
    tokenizer_encode,
)


def tiny_cfg():
    return ModelConfig(
        dit=EchoDiTConfig(
            latent_size=8, model_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, text_model_size=16, text_num_layers=1,
            text_num_heads=2, text_intermediate_size=32,
            speaker_patch_size=2, speaker_model_size=16,
            speaker_num_layers=1, speaker_num_heads=2,
            speaker_intermediate_size=32, timestep_embed_size=16,
            adaln_rank=8),
        sampler=SamplerConfig(num_steps=2, sequence_length=16),
    )


def test_text_normalization_and_bytes():
    assert normalize_text_prompt("hi…").startswith("[S1] hi...")
    ids = tokenizer_encode("ab", normalize=False)
    assert ids.tolist() == [0, 97, 98]


def test_generate_latents_shape():
    model = Model(tiny_cfg())
    lat = model.generate_latents("hello", rng_seed=0)
    assert lat.shape == (1, 16, 8)
    assert np.isfinite(np.asarray(lat)).all()
    # deterministic for same seed
    lat2 = model.generate_latents("hello", rng_seed=0)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat2))


def test_generate_with_speaker_conditioning():
    model = Model(tiny_cfg())
    spk = jnp.asarray(np.random.randn(1, 4, 8), jnp.float32)
    mask = jnp.ones((1, 4), bool)
    lat = model.generate_latents("hi", speaker_latent=spk, speaker_mask=mask)
    assert lat.shape == (1, 16, 8)
