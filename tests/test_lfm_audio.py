"""LFM2.5-Audio: hybrid LFM2 backbone, conformer, depthformer frames,
detokenizer, interleaved/sequential generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.sts.models.lfm_audio import (
    AudioPreprocessor,
    ChatState,
    ConformerEncoder,
    ConformerEncoderConfig,
    DepthformerConfig,
    DetokenizerConfig,
    LFM2AudioConfig,
    LFM2AudioDetokenizer,
    LFM2AudioProcessor,
    LFM2Config,
    LFMModality,
    Lfm2Model,
    Model,
    PreprocessorConfig,
)


def tiny_config():
    return LFM2AudioConfig(
        codebooks=4, audio_vocab_size=20,
        interleaved_n_text=2, interleaved_n_audio=3,
        preprocessor=PreprocessorConfig(features=16, n_fft=64,
                                        window_size=0.004,
                                        window_stride=0.002),
        encoder=ConformerEncoderConfig(
            feat_in=16, n_layers=1, d_model=16, subsampling_factor=8,
            subsampling_conv_channels=8, n_heads=2, conv_kernel_size=5),
        lfm=LFM2Config(vocab_size=200, hidden_size=32,
                       num_hidden_layers=3, num_attention_heads=4,
                       num_key_value_heads=2, intermediate_size=96,
                       full_attn_idxs=(1,)),
        depthformer=DepthformerConfig(layers=1, dim=8, num_heads=2,
                                      num_kv_heads=1),
        adapter_hidden_dims=(24,))


def test_lfm2_backbone_cache_consistency():
    """Cached step-by-step decode must match a full forward."""
    cfg = LFM2Config(vocab_size=50, hidden_size=16, num_hidden_layers=3,
                     num_attention_heads=4, num_key_value_heads=2,
                     intermediate_size=48, full_attn_idxs=(1,))
    m = Lfm2Model(cfg)
    ids = jnp.asarray(np.random.randint(0, 50, (1, 6)))
    emb = m.embed_tokens(ids)
    full, _ = m(emb)
    caches = m.make_caches(1, max_len=16)
    outs = []
    for t in range(6):
        h, caches = m(emb[:, t: t + 1], caches)
        outs.append(h)
    step = jnp.concatenate(outs, axis=1)
    assert np.allclose(np.asarray(full), np.asarray(step), atol=1e-4)


def test_conformer_encoder_subsamples_8x():
    enc = ConformerEncoder(ConformerEncoderConfig(
        feat_in=16, n_layers=1, d_model=16, subsampling_factor=8,
        subsampling_conv_channels=8, n_heads=2, conv_kernel_size=5))
    x = jnp.asarray(np.random.randn(1, 40, 16).astype(np.float32) * 0.1)
    out, lengths = enc(x)
    assert out.shape == (1, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_preprocessor_mel_shape():
    pre = AudioPreprocessor(PreprocessorConfig(
        features=16, n_fft=64, window_size=0.004, window_stride=0.002))
    mel = pre(np.random.randn(640).astype(np.float32))
    assert mel.ndim == 2 and mel.shape[1] == 16
    assert np.isfinite(np.asarray(mel)).all()
    # per-feature normalization → roughly zero mean per feature
    assert abs(float(jnp.mean(mel))) < 1.0


def test_detokenizer_istft_output():
    det = LFM2AudioDetokenizer(DetokenizerConfig(
        hidden_size=16, num_hidden_layers=2,
        layer_types=("conv", "sliding_attention"), num_attention_heads=2,
        num_key_value_heads=1, intermediate_size=32, sliding_window=4,
        output_size=2 * (32 // 2 + 1), num_codebooks=4, vocab_size=20,
        n_fft=32, hop_length=8, upsample_factor=2))
    codes = jnp.asarray(np.random.randint(0, 20, (1, 4, 5)))
    wav = det(codes)
    # 'same' mode: output = n_frames × hop = (5 × 2) × 8 = 80
    assert wav.shape == (1, 5 * 2 * 8)
    assert np.isfinite(np.asarray(wav)).all()


def test_generate_interleaved_modality_schedule():
    model = Model(tiny_config())
    text = np.random.randint(3, 100, (1, 5)).astype(np.int32)
    results = list(model.generate_interleaved(
        text_tokens=text, max_new_tokens=8, temperature=0.0,
        audio_temperature=0.0, key=jax.random.PRNGKey(0)))
    assert len(results) <= 8
    # interleave: 2 text then audio frames (unless early EOS)
    mods = [m for _, m in results]
    if len(mods) >= 3 and mods[0] == LFMModality.TEXT:
        audio_frames = [t for t, m in results
                        if m == LFMModality.AUDIO_OUT]
        for f in audio_frames:
            assert f.shape == (4,)


def test_generate_sequential_runs():
    model = Model(tiny_config())
    text = np.random.randint(3, 100, (1, 4)).astype(np.int32)
    results = list(model.generate_sequential(
        text_tokens=text, max_new_tokens=5, temperature=0.0,
        audio_temperature=0.0, key=jax.random.PRNGKey(1)))
    assert 0 < len(results) <= 5


def test_chat_state_modalities():
    class FakeTok:
        bos_token_id = 1

        def encode(self, s, add_special_tokens=False):
            return [ord(c) % 50 + 2 for c in s][:10]

        def decode(self, ids):
            return "".join(chr(97 + i % 26) for i in ids)

    proc = LFM2AudioProcessor(
        tokenizer=FakeTok(),
        preprocessor=AudioPreprocessor(PreprocessorConfig(
            features=16, n_fft=64, window_size=0.004,
            window_stride=0.002)))
    st = ChatState(proc)
    st.new_turn("user")
    st.add_text("hi")
    st.add_audio(np.random.randn(640).astype(np.float32),
                 sample_rate=16000)
    st.end_turn()
    mods = st.get_modalities()[0]
    assert (mods == LFMModality.AUDIO_IN).sum() > 0
    assert mods[0] == LFMModality.TEXT  # BOS
    assert st.get_audio_features().shape[-1] == 16


def test_processor_chat_formatting():
    """format_chat/tokenize_chat (reference processor.py:329-368): chat
    template when available, ChatML fallback otherwise."""
    import numpy as np

    from mlx_audio_tpu.sts.models.lfm_audio.processor import (
        LFM2AudioProcessor,
    )

    class Tok:
        def encode(self, t, add_special_tokens=False):
            return list(range(len(t.split())))

    p = LFM2AudioProcessor(tokenizer=Tok())
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hello"}]
    s = p.format_chat(msgs)
    assert "system" in s and "be brief" in s and s.rstrip().endswith(
        "<|im_start|>assistant")
    s2 = p.format_chat(msgs, add_generation_prompt=False)
    assert "assistant" not in s2
    ids = p.tokenize_chat(msgs)
    assert isinstance(ids, np.ndarray) and ids.size > 0

    class TemplTok(Tok):
        def apply_chat_template(self, messages, tokenize=False,
                                add_generation_prompt=True):
            return "TEMPLATED"

    p2 = LFM2AudioProcessor(tokenizer=TemplTok())
    assert p2.format_chat(msgs) == "TEMPLATED"


# ---------------------------------------------------------------------------
# Continuous batching (LFM2AudioBatcher)
# ---------------------------------------------------------------------------


def _items_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for (pa, ma), (pb, mb) in zip(a, b):
        assert ma == mb
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_lfm2_batcher_greedy_equals_direct():
    """A greedy request through the slot pool must reproduce the direct
    interleaved loop's (payload, modality) stream exactly."""
    model = Model(tiny_config())
    text = np.random.default_rng(0).integers(3, 100, (1, 5)).astype(np.int32)
    direct = list(model.generate_interleaved(
        text_tokens=text, max_new_tokens=10, temperature=0.0,
        audio_temperature=0.0, key=jax.random.PRNGKey(0)))

    batcher = model.make_batcher(slots=2, max_len=64, tick_frames=4)
    try:
        got = batcher.submit(
            text_tokens=text, max_new_tokens=10, temperature=0.0,
            audio_temperature=0.0, seed=0).result(timeout=600)
        assert batcher.dispatch_count >= 1
    finally:
        batcher.close()
    _items_equal(got, direct)


def test_lfm2_batcher_batched_equals_solo():
    """N concurrent sampled requests fused in one pool produce exactly the
    items each request produces alone in an equally-sized pool (per-row
    PRNG streams make rows independent of co-tenants)."""
    model = Model(tiny_config())
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 100, (1, n)).astype(np.int32)
               for n in (4, 6, 5)]
    seeds = [11, 22, 33]

    def run_pool(reqs):
        b = model.make_batcher(slots=3, max_len=64, tick_frames=4)
        try:
            futs = [b.submit(text_tokens=p, max_new_tokens=9,
                             temperature=0.8, top_k=8,
                             audio_temperature=0.9, audio_top_k=3,
                             seed=s) for p, s in reqs]
            return [f.result(timeout=600) for f in futs]
        finally:
            b.close()

    batched = run_pool(list(zip(prompts, seeds)))
    for i, (p, s) in enumerate(zip(prompts, seeds)):
        solo = run_pool([(p, s)])[0]
        _items_equal(batched[i], solo)


def test_lfm2_generate_routes_through_hook():
    """generate_interleaved with an installed batcher streams items through
    the slot pool (and matches the direct greedy loop)."""
    model = Model(tiny_config())
    text = np.random.default_rng(2).integers(3, 100, (1, 6)).astype(np.int32)
    direct = list(model.generate_interleaved(
        text_tokens=text, max_new_tokens=8, temperature=0.0,
        audio_temperature=0.0, key=jax.random.PRNGKey(0)))

    batcher = model.make_batcher(slots=2, max_len=64, tick_frames=4)
    batcher.install()
    try:
        routed = list(model.generate_interleaved(
            text_tokens=text, max_new_tokens=8, temperature=0.0,
            audio_temperature=0.0))
        assert batcher.dispatch_count >= 1
    finally:
        batcher.close()
    _items_equal(routed, direct)


def test_lfm2_batcher_mid_flight_join_and_warmup():
    """Slots recycle under load (5 requests, 2 slots — joins happen while
    co-tenants are mid-utterance) and warmup() pre-compiles every slot's
    install + the fused tick."""
    model = Model(tiny_config())
    b = model.make_batcher(slots=2, max_len=64, tick_frames=4)
    try:
        b.warmup()
        rng = np.random.default_rng(3)
        futs = [b.submit(
            text_tokens=rng.integers(3, 100, (1, 3 + i)).astype(np.int32),
            max_new_tokens=7, temperature=0.7, audio_temperature=0.8,
            seed=i) for i in range(5)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        b.close()
    assert len(outs) == 5
    for out in outs:
        assert 0 < len(out) <= 7
        for payload, mod in out:
            assert mod in (LFMModality.TEXT, LFMModality.AUDIO_OUT)
