"""IndexTTS: conformer/perceiver conditioning, GPT latent loop, vocoder."""

import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.indextts import (
    ConformerArgs,
    GPTConfig,
    Model,
    ModelArgs,
)


def tiny_args():
    return ModelArgs(
        gpt=GPTConfig(
            model_dim=32, heads=4, layers=2, max_mel_tokens=32,
            max_text_tokens=32, number_text_tokens=60, number_mel_codes=70,
            start_mel_token=68, stop_mel_token=69, start_text_token=0,
            stop_text_token=1, condition_num_latent=4,
            condition_module=ConformerArgs(
                input_size=16, output_size=24, num_blocks=1,
                linear_units=48, attention_heads=2, perceiver_mult=2)),
        bigvgan={
            "num_mels": 16, "upsample_rates": [4, 2],
            "upsample_kernel_sizes": [8, 4],
            "upsample_initial_channel": 16, "resblock": "1",
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 2]],
            "activation": "snakebeta", "snake_logscale": True,
            "gpt_dim": 32, "speaker_embedding_dim": 12,
        },
        sample_rate=24000,
    )


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 50) + 2 for c in text][:8]


def test_conditioning_shapes():
    model = Model(tiny_args())
    mel = jnp.asarray(np.random.randn(1, 40, 16).astype(np.float32))
    cond = model.get_conditioning(mel)
    assert cond.shape == (1, 4, 32)  # n_latents × model_dim


def test_generate_end_to_end():
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    ref = np.random.randn(12000).astype(np.float32) * 0.1
    results = list(model.generate("hello", ref_audio=ref, max_tokens=8,
                                  seed=0))
    assert len(results) == 1
    assert results[0].audio.size > 0
    assert np.isfinite(results[0].audio).all()
