"""LLM-TTS model tests: Orpheus/Vyvo SNAC frame packing + Sesame frame loop
(random weights, injected tokenizer/codec — reference strategy)."""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.snac_lm import codes_to_layers, layers_to_codes


def test_snac_code_layer_roundtrip():
    rng = np.random.default_rng(0)
    flat = []
    for _ in range(5):  # 5 frames of 7 codes with slot offsets
        l1 = rng.integers(0, 4096)
        l2a, l2b = rng.integers(0, 4096, 2)
        l3 = rng.integers(0, 4096, 4)
        flat += [l1, l2a + 4096, l3[0] + 2 * 4096, l3[1] + 3 * 4096,
                 l2b + 4 * 4096, l3[2] + 5 * 4096, l3[3] + 6 * 4096]
    layers = codes_to_layers(flat)
    assert layers[0].shape == (1, 5)
    assert layers[1].shape == (1, 10)
    assert layers[2].shape == (1, 20)
    assert all(int(np.asarray(l).min()) >= 0 for l in layers)
    back = layers_to_codes(layers)
    assert back == [int(x) for x in flat]


class FakeTok:
    def __call__(self, text):
        class R:
            input_ids = [10, 11, 12]

        return R()

    def encode(self, text):
        return [10, 11, 12]


class FakeSnac:
    def decode(self, layers):
        n = np.asarray(layers[2]).shape[-1]
        return np.zeros((1, 1, n * 512), np.float32)

    def encode(self, audio):
        n = max(audio.shape[-1] // 2048, 1)
        return [np.zeros((1, n), int), np.zeros((1, 2 * n), int),
                np.zeros((1, 4 * n), int)]


def test_orpheus_generate_with_tiny_backbone():
    from mlx_audio_tpu.tts.models.llama import Model, ModelConfig

    cfg = ModelConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=130000,
    )
    m = Model(cfg)
    m.set_runtime(tokenizer=FakeTok(), codec=FakeSnac())
    results = list(m.generate("hello world", voice="zoe", max_tokens=30,
                              temperature=0.8))
    # random weights may or may not produce >=7 audio-range tokens; at most
    # one segment either way, and the pipeline must not crash
    assert len(results) <= 1
    for r in results:
        assert r.sample_rate == 24000
        assert r.samples > 0


def test_orpheus_parse_output():
    from mlx_audio_tpu.tts.models.llama import Model, ModelConfig

    cfg = ModelConfig(hidden_size=32, num_hidden_layers=1, intermediate_size=64,
                      num_attention_heads=2, vocab_size=130000)
    m = Model(cfg)
    A = m.AUDIO_TOKENS_START
    toks = [1, 2, m.START_OF_SPEECH] + [A + i for i in range(9)] + [m.END_OF_SPEECH]
    codes = m.parse_output(np.asarray(toks))
    assert codes == list(range(7))  # trimmed to multiple of 7, offset removed


def test_sesame_frame_generation():
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.sesame.sesame import (
        DepthDecoderConfig,
        ModelConfig,
        SesameModel,
        _generate_frames,
        _prefill,
    )

    cfg = ModelConfig(
        text_vocab_size=100, audio_vocab_size=32, audio_num_codebooks=4,
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        depth_decoder_config=dict(
            backbone_hidden_size=64, hidden_size=32, intermediate_size=64,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            num_hidden_layers=1, num_codebooks=4, vocab_size=32,
        ),
        rope_scaling={"rope_type": "default"},
    )
    model = SesameModel(cfg)
    T = 6
    tokens = np.zeros((1, T, 5), np.int32)
    tokens[:, :, -1] = np.arange(T)
    mask = np.zeros((1, T, 5), bool)
    mask[:, :, -1] = True

    caches = model.make_backbone_caches(1, T + 20)
    h_last, caches = _prefill(model, caches, jnp.asarray(tokens), jnp.asarray(mask))
    assert h_last.shape == (1, 64)
    frames, n = _generate_frames(
        model, caches, h_last, jax.random.PRNGKey(0), 10, 0.9, 8
    )
    n = int(n)
    assert frames.shape == (1, 10, 4)
    f = np.asarray(frames)[0, :n]
    assert (f >= 0).all() and (f < 32).all()


def test_sesame_sanitize_key_mapping():
    from mlx_audio_tpu.tts.models.sesame.sesame import Model, ModelConfig

    cfg = ModelConfig(
        text_vocab_size=100, audio_vocab_size=32, audio_num_codebooks=4,
        hidden_size=64, num_hidden_layers=1, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        depth_decoder_config=dict(hidden_size=32, intermediate_size=64,
                                  num_attention_heads=2, num_key_value_heads=1,
                                  head_dim=16, num_hidden_layers=1, vocab_size=32),
        rope_scaling={"rope_type": "default"},
    )
    m = Model(cfg)
    w = {
        "backbone.layers.0.attn.q_proj.weight": np.zeros((4, 4)),
        "backbone.layers.0.sa_norm.scale": np.zeros(4),
        "backbone.layers.0.mlp.w1.weight": np.zeros((4, 4)),
        "decoder.norm.scale": np.zeros(4),
    }
    out = m.sanitize(w)
    assert "model.backbone.layers.0.self_attn.q_proj.weight" in out
    assert "model.backbone.layers.0.input_layernorm.weight" in out
    assert "model.backbone.layers.0.mlp.gate_proj.weight" in out
    assert "model.decoder.norm.weight" in out


def test_orpheus_streaming_generate_yields_chunks():
    """stream=True decodes incrementally with code context
    (reference llama.py:371-497 streaming path)."""
    from mlx_audio_tpu.tts.models.llama import Model, ModelConfig

    cfg = ModelConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=130000,
    )
    m = Model(cfg)

    class StreamSnac(FakeSnac):
        def decode_stream(self, layers, prev_codes=None, context_frames=8):
            n = np.asarray(layers[2]).shape[-1]
            ctx = [np.asarray(l)[:, -context_frames:] for l in layers]
            return np.zeros((1, 1, n * 512), np.float32), ctx

    m.set_runtime(tokenizer=FakeTok(), codec=StreamSnac())
    results = list(m.generate("hello world", voice="zoe", max_tokens=60,
                              temperature=0.9, stream=True,
                              streaming_interval=0.05))
    # random weights: audio-range tokens may or may not appear; must not
    # crash, and any yielded chunk is well-formed
    for r in results:
        assert r.sample_rate == 24000 and r.samples > 0


def test_sesame_chunked_frames_match_monolithic():
    """_generate_frames_chunk resumes (caches, h_last) across calls, so the
    concatenated chunks equal one monolithic decode with the same key
    (streaming path of reference sesame.py:760-830)."""
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.sesame.sesame import (
        ModelConfig,
        SesameModel,
        _generate_frames,
        _generate_frames_chunk,
        _prefill,
    )

    cfg = ModelConfig(
        text_vocab_size=100, audio_vocab_size=32, audio_num_codebooks=4,
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        depth_decoder_config=dict(
            backbone_hidden_size=64, hidden_size=32, intermediate_size=64,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            num_hidden_layers=1, num_codebooks=4, vocab_size=32,
        ),
        rope_scaling={"rope_type": "default"},
    )
    model = SesameModel(cfg)
    T = 6
    tokens = np.zeros((1, T, 5), np.int32)
    tokens[:, :, -1] = np.arange(T)
    mask = np.zeros((1, T, 5), bool)
    mask[:, :, -1] = True
    max_frames = 9

    def prefill():
        caches = model.make_backbone_caches(1, T + max_frames + 2)
        return _prefill(model, caches, jnp.asarray(tokens),
                        jnp.asarray(mask))

    h_last, caches = prefill()
    frames, n = _generate_frames(
        model, caches, h_last, jax.random.PRNGKey(3), max_frames, 0.9, 8)
    full = np.asarray(frames)[0, : int(n)]

    h_last, caches = prefill()
    key = jax.random.PRNGKey(3)
    got = []
    produced = 0
    while produced < max_frames:
        f, k, caches, h_last, done, key = _generate_frames_chunk(
            model, caches, h_last, key,
            jnp.array(max_frames - produced, jnp.int32), 4, 0.9, 8)
        k = int(k)
        produced += k
        got.append(np.asarray(f)[0, :k])
        if bool(done):
            break
    np.testing.assert_array_equal(np.concatenate(got), full)
