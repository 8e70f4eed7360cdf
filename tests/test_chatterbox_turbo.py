"""Chatterbox Turbo: GPT-2 T3 decode, meanflow CFM, tiny pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.chatterbox.t3 import T3Cond
from mlx_audio_tpu.tts.models.chatterbox_turbo import (
    Model,
    ModelConfig,
    T3Turbo,
    T3TurboConfig,
)

TINY_GPT2 = {"n_embd": 32, "n_head": 4, "n_layer": 2, "n_positions": 256,
             "vocab_size": 64}


def tiny_cfg():
    return T3TurboConfig(
        text_tokens_dict_size=50, speech_tokens_dict_size=70,
        start_speech_token=60, stop_speech_token=61, max_speech_tokens=32,
        speaker_embed_size=16, speech_cond_prompt_len=8,
        gpt2_overrides=TINY_GPT2)


def test_turbo_t3_generates():
    t3 = T3Turbo(tiny_cfg())
    cond = T3Cond(speaker_emb=jnp.zeros((1, 16)),
                  cond_prompt_speech_emb=jnp.zeros((1, 4, 32)),
                  emotion_adv=None)
    toks = t3.inference_turbo(cond, np.array([[3, 4, 5]]), max_gen_len=10,
                              key=jax.random.PRNGKey(0))
    assert toks.shape[0] == 1 and toks.shape[1] <= 10
    assert (toks < 70).all()


def test_meanflow_cfm_runs():
    from mlx_audio_tpu.codec.models.s3gen import (
        CFMParams,
        ConditionalDecoder,
    )
    from mlx_audio_tpu.codec.models.s3gen.s3gen import CausalConditionalCFM

    est = ConditionalDecoder(in_channels=32, out_channels=8, channels=[16],
                             attention_head_dim=8, n_blocks=1,
                             num_mid_blocks=1, num_heads=2, meanflow=True)
    cfm = CausalConditionalCFM(estimator=est, cfm_params=CFMParams())
    cfm.MEL_CHANNELS = 8
    mu = jnp.asarray(np.random.randn(1, 12, 8), jnp.float32)
    mask = jnp.ones((1, 12, 1))
    spks = jnp.zeros((1, 8))
    cond = jnp.zeros((1, 12, 8))
    out, _ = cfm(mu, mask, 2, spks=spks, cond=cond, meanflow=True)
    assert out.shape == (1, 12, 8)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic (fixed noise seed)
    out2, _ = cfm(mu, mask, 2, spks=spks, cond=cond, meanflow=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
