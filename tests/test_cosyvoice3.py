"""CosyVoice3: DiT flow matching, causal HiFT, unified-embedding LM,
pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.cosyvoice3 import (
    CosyVoice3Config,
    CosyVoice3LM,
    DiTConfig,
    FlowConfig,
    HiFiGANConfig,
    LLMConfig,
    build_cosyvoice3,
)
from mlx_audio_tpu.tts.models.cosyvoice3.cosyvoice3 import (
    ZERO_SHOT_PROMPT_PREFIX,
    normalize_text,
    split_text,
)
from mlx_audio_tpu.tts.models.cosyvoice3.dit import (
    DiT,
    chunk_attention_mask,
)
from mlx_audio_tpu.tts.models.cosyvoice3.hifigan import CausalHiFTGenerator


def tiny_config():
    return CosyVoice3Config(
        llm=LLMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=40,
            extended_vocab_size=8, hidden_size=32, num_hidden_layers=2,
            intermediate_size=64, num_attention_heads=4,
            num_key_value_heads=2, vocab_size=120),
        flow=FlowConfig(
            input_size=16, output_size=16, spk_embed_dim=8, vocab_size=40,
            pre_lookahead_channels=24, n_timesteps=2,
            dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=16,
                          ff_mult=2, mel_dim=16, mu_dim=16, spk_dim=16,
                          out_channels=16, static_chunk_size=4)),
        hifigan=HiFiGANConfig(
            in_channels=16, base_channels=32, nb_harmonics=2,
            sampling_rate=24000, upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
            source_resblock_kernel_sizes=(3, 3),
            source_resblock_dilation_sizes=((1,), (1,)),
            conv_pre_look_right=2),
    )


def test_dit_shapes_and_chunk_mask():
    dit = DiT(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
              mel_dim=16, mu_dim=16, spk_dim=16, out_channels=16,
              static_chunk_size=4)
    x = jnp.zeros((2, 8, 16))
    mu = jnp.ones((2, 8, 16)) * 0.1
    t = jnp.full((2,), 0.3)
    spk = jnp.ones((2, 16)) * 0.2
    cond = jnp.zeros((2, 8, 16))
    out = dit(x, mu, t, spk, cond)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # streaming chunk mask: position 0 can't see past chunk 0
    m = np.asarray(chunk_attention_mask(8, 4))
    assert m[0, 3] and not m[0, 4]
    assert m[4, 7] and m[7, 0]
    out_s = dit(x, mu, t, spk, cond, streaming=True)
    assert out_s.shape == (2, 8, 16)


def test_flow_inference_shape_and_prompt_slice():
    cfg = tiny_config()
    model = build_cosyvoice3(cfg)
    prompt_tokens = np.random.randint(0, 40, (1, 4))
    prompt_mel = np.random.randn(1, 8, 16).astype(np.float32) * 0.1
    tokens = np.random.randint(0, 40, (1, 10))
    spk = np.random.randn(1, 8).astype(np.float32)
    mel = model.tokens_to_mel(tokens, prompt_tokens, prompt_mel, spk,
                              n_timesteps=2, key=jax.random.PRNGKey(0))
    # 10 new tokens × ratio 2 = 20 frames past the prompt
    assert mel.shape == (1, 20, 16)
    assert np.isfinite(np.asarray(mel)).all()


def test_causal_hift_output_length():
    h = CausalHiFTGenerator(
        in_channels=16, base_channels=32, nb_harmonics=2,
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 2]],
        source_resblock_kernel_sizes=[3, 3],
        source_resblock_dilation_sizes=[[1], [1]],
        conv_pre_look_right=2)
    mel = jnp.asarray(np.random.randn(1, 12, 16).astype(np.float32) * 0.1)
    wav, src = h(mel, key=jax.random.PRNGKey(0))
    # 12 frames × 4·2 upsample × hop 4 = 384 samples
    assert wav.shape == (1, 12 * 4 * 2 * 4)
    assert np.isfinite(np.asarray(wav)).all()
    assert float(jnp.abs(wav).max()) <= 0.99 + 1e-6


def test_llm_unified_embedding_stops_on_extended_tokens():
    cfg = tiny_config().llm
    lm = CosyVoice3LM(cfg)
    text = np.array([1, 2, 3, 4], np.int32)
    tokens, count = lm.inference(text, max_token_text_ratio=5.0,
                                 min_token_text_ratio=1.0,
                                 key=jax.random.PRNGKey(0))
    assert count <= 20 and tokens.shape[0] == count
    if count:
        # any token >= speech_token_size stops and is never emitted
        assert tokens.max() < cfg.speech_token_size
    # a second instance with longer min-length must still terminate
    lm2 = CosyVoice3LM(cfg)
    tokens2, count2 = lm2.inference(
        text, max_token_text_ratio=10.0, min_token_text_ratio=2.0,
        key=jax.random.PRNGKey(1))
    assert count2 >= 0  # loop terminates


def test_full_pipeline_zero_shot_and_vc():
    model = build_cosyvoice3(tiny_config())
    text = np.array([5, 6, 7], np.int32)
    prompt_text = np.array([1, 2], np.int32)
    prompt_tokens = np.random.randint(0, 40, (1, 4))
    prompt_mel = np.random.randn(1, 8, 16).astype(np.float32) * 0.1
    spk = np.random.randn(1, 8).astype(np.float32)
    audio = model.synthesize(text, prompt_text, prompt_tokens, prompt_mel,
                             spk, n_timesteps=2, min_token_text_ratio=1.0,
                             max_token_text_ratio=4.0,
                             key=jax.random.PRNGKey(0))
    assert audio.ndim == 2 and audio.shape[1] > 0
    assert np.isfinite(audio).all()

    src = np.random.randint(0, 40, (1, 10))
    audio_vc = model.synthesize_vc(src, prompt_tokens, prompt_mel, spk,
                                   n_timesteps=2)
    # 10 tokens → 20 frames → 20·8·4 samples
    assert audio_vc.shape[1] == 20 * 8 * 4
    assert np.isfinite(audio_vc).all()


def test_text_frontend():
    assert normalize_text("I have 3 cats") == "I have three cats"
    assert normalize_text("你好 世界（测试）") == "你好世界测试"
    # control tags bypass normalization
    assert normalize_text("<|en|> 42") == "<|en|> 42"
    chunks = split_text("Hello world. " * 30)
    assert len(chunks) >= 1
    assert all(c.strip() for c in chunks)
    assert ZERO_SHOT_PROMPT_PREFIX.endswith("<|endofprompt|>")


def test_dit_bf16_dtype_stable():
    from mlx_audio_tpu.nn.module import cast_floats

    dit = cast_floats(DiT(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                          mel_dim=16, mu_dim=16, spk_dim=16,
                          out_channels=16, static_chunk_size=4),
                      jnp.bfloat16)
    out = dit(jnp.zeros((2, 8, 16), jnp.bfloat16),
              jnp.ones((2, 8, 16), jnp.bfloat16) * 0.1,
              jnp.full((2,), 0.3),
              jnp.ones((2, 16), jnp.bfloat16) * 0.2,
              jnp.zeros((2, 8, 16), jnp.bfloat16))
    assert out.dtype == jnp.bfloat16


def test_ras_batcher_v3_stop_rule():
    """CosyVoice3 shares the RAS batcher with the v3 stop rule (any token
    >= V ends the stream); batched == one-slot-sequential."""
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.cosyvoice2.batcher import RASBatcher
    from mlx_audio_tpu.tts.models.cosyvoice3.llm import CosyVoice3LM

    seed_rng(23)
    lm = CosyVoice3LM(tiny_config().llm)

    class Shim:
        pass

    m = Shim()
    m.llm = lm
    prompts = [np.arange(3) + 2, np.arange(5) + 1]
    embeds = [np.asarray(lm.build_prompt_embeds(p, None, None), np.float32)
              for p in prompts]
    seeds = [41, 42]

    def run(slots, items):
        b = RASBatcher(m, lm=lm, v3=True, slots=slots, max_len=256,
                       tick_frames=4)
        try:
            futs = [b.submit(e, min_tokens=2, max_steps=10, seed=s)
                    for e, s in items]
            return [list(f.result(timeout=600)) for f in futs]
        finally:
            b.close()

    batched = run(2, list(zip(embeds, seeds)))
    sequential = [run(1, [(e, s)])[0] for e, s in zip(embeds, seeds)]
    assert batched == sequential
    V = lm.speech_token_size
    for out in batched:
        assert len(out) <= 10
        assert all(0 <= t < V for t in out)
