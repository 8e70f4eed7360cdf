"""VoxCPM: MiniCPM LM, local DiT CFM, AudioVAE, on-device patch loop."""

import numpy as np

from mlx_audio_tpu.tts.models.voxcpm import Model, ModelArgs
from mlx_audio_tpu.tts.models.voxcpm.voxcpm import (
    AudioVAEConfig,
    CFMConfig,
    DiTConfig,
    EncoderConfig,
    LMConfig,
)


def tiny_args():
    return ModelArgs(
        lm_config=LMConfig(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=64, vocab_size=120),
        encoder_config=EncoderConfig(hidden_dim=24, ffn_dim=48, num_heads=2,
                                     num_layers=1),
        dit_config=DiTConfig(hidden_dim=24, ffn_dim=48, num_heads=2,
                             num_layers=1, cfm_config=CFMConfig()),
        audio_vae_config=AudioVAEConfig(
            encoder_dim=4, encoder_rates=[2, 5], latent_dim=8,
            decoder_dim=16, decoder_rates=[5, 2], sample_rate=16000),
        patch_size=2, feat_dim=8, scalar_quantization_latent_dim=16,
        residual_lm_num_layers=1, max_length=64)


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 90) + 3 for c in text][:10]


def test_audio_vae_roundtrip_shapes():
    import jax.numpy as jnp

    model = Model(tiny_args())
    wav = jnp.asarray(np.random.randn(1, 100).astype(np.float32)) * 0.1
    lat = model.audio_vae.encode(wav)
    assert lat.shape == (1, 10, 8)  # hop = 10
    out = model.audio_vae.decode(lat)
    assert out.shape == (1, 100)


def test_generate_no_clone():
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    results = list(model.generate("hello", max_tokens=4,
                                  inference_timesteps=2, seed=0))
    assert len(results) == 1
    audio = results[0].audio
    assert audio.size > 0
    assert np.isfinite(audio).all()


def test_generate_voice_clone():
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    ref = np.random.randn(400).astype(np.float32) * 0.1
    results = list(model.generate("hi", ref_text="ref", ref_audio=ref,
                                  max_tokens=3, inference_timesteps=2,
                                  seed=1))
    assert np.isfinite(results[0].audio).all()
