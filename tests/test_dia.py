"""Dia tests: delay transforms + tiny-model CFG generation loop."""

import numpy as np
import pytest


def test_delay_roundtrip():
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.dia.audio import (
        apply_audio_delay,
        revert_audio_delay,
    )

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 100, (1, 20, 3)).astype(np.int32))
    delay = [0, 2, 3]
    delayed = apply_audio_delay(codes, delay, bos_value=1026, pad_value=1025)
    d = np.asarray(delayed)
    # channel 1 delayed by 2: first two positions BOS
    assert (d[0, :2, 1] == 1026).all()
    np.testing.assert_array_equal(d[0, 2:, 1], np.asarray(codes)[0, :-2, 1])
    reverted = revert_audio_delay(delayed, delay, pad_value=1025, total_len=20)
    r = np.asarray(reverted)
    # valid region matches original
    np.testing.assert_array_equal(r[0, : 20 - 3], np.asarray(codes)[0, : 20 - 3])


@pytest.fixture(scope="module")
def tiny_dia():
    from mlx_audio_tpu.tts.models.dia import Model

    cfg = {
        "model": {
            "encoder": {"n_layer": 1, "n_embd": 32, "n_hidden": 64,
                        "n_head": 2, "head_dim": 16},
            "decoder": {"n_layer": 1, "n_embd": 32, "n_hidden": 64,
                        "gqa_query_heads": 4, "kv_heads": 2,
                        "gqa_head_dim": 8, "cross_query_heads": 2,
                        "cross_head_dim": 16},
            "src_vocab_size": 128, "tgt_vocab_size": 1028,
        },
        "data": {"text_length": 128, "audio_length": 128, "channels": 3,
                 "delay_pattern": [0, 1, 2]},
    }
    m = Model(cfg)

    class FakeDac:
        def encode(self, audio):
            T = max(audio.shape[-1] // 512, 2)
            return None, np.zeros((1, 3, T), np.int32), None, None, None

        def decode_codes(self, codes):
            T = np.asarray(codes).shape[-1]
            return np.zeros((1, 1, T * 512), np.float32)

    m.set_runtime(dac=FakeDac())
    return m


def test_dia_generate(tiny_dia):
    results = list(tiny_dia.generate("[S1] Hello. [S2] Hi there.",
                                     max_tokens=16, temperature=1.0))
    assert len(results) == 1
    r = results[0]
    assert r.sample_rate == 44100
    assert r.samples > 0
    assert r.token_count <= 16 + 2 + 2  # max_tokens + eos cascade


def test_dia_voice_clone_prefill(tiny_dia):
    ref = np.zeros(4096, np.float32)
    results = list(tiny_dia.generate("[S1] Test. [S2] Ok.", max_tokens=8,
                                     ref_audio=ref, ref_text="[S1] Ref."))
    assert len(results) == 1


# ---------------------------------------------------------------------------
# DiaBatcher: CFG-paired slot batching
# ---------------------------------------------------------------------------


def _dia_batch_decode(model, texts, seeds, slots, max_tokens=12,
                      tick_frames=4, temperature=1.3, cfg_scale=3.0):
    b = model.make_batcher(slots=slots, tick_frames=tick_frames,
                           max_tokens_cap=64)
    try:
        futs = []
        for text, seed in zip(texts, seeds):
            src, mask = model._prepare_text(text)
            futs.append(b.submit(src, mask, max_tokens=max_tokens,
                                 temperature=temperature,
                                 cfg_scale=cfg_scale, seed=seed))
        outs = [f.result(timeout=600) for f in futs]
        return outs, b.steps
    finally:
        b.close()


def test_dia_batcher_greedy_matches_direct_loop(tiny_dia):
    """temp=0 through the batcher equals the single-request
    `_generate_loop` (same CFG combine, delay forcing, EOS cascade)."""
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.lm.cache import KVCache
    from mlx_audio_tpu.tts.models.dia.dia import (_encode_text,
                                                  _generate_loop)

    model = tiny_dia
    data = model.config.data
    dec = model.config.model.decoder
    text = "[S1] Greedy check. [S2] Ok."
    src, src_mask = model._prepare_text(text)
    src2 = jnp.asarray(np.stack([np.zeros_like(src), src]))
    pos = jnp.broadcast_to(jnp.arange(data.text_length)[None],
                           (2, data.text_length))
    pmask = jnp.asarray(np.stack([np.zeros_like(src_mask), src_mask]))
    enc_mask = (pmask[:, :, None] == pmask[:, None, :])[:, None]
    enc_mask = jnp.where(enc_mask, 0.0, -jnp.inf).astype(jnp.float32)
    _, cross_kvs = _encode_text(model.model, src2, pos, enc_mask)
    max_tokens = 12
    kv_len = 64 + max(data.delay_pattern) + 64  # batcher cap formula
    caches = [KVCache(2, dec.kv_heads, kv_len, dec.gqa_head_dim,
                      dtype=jnp.float32) for _ in range(dec.n_layer)]
    cross_mask = jnp.where(pmask[:, None, None, :], 0.0,
                           -jnp.inf).astype(jnp.float32)
    start = jnp.full((data.channels,), data.audio_bos_value, jnp.int32)
    buf, n = _generate_loop(
        model.model, caches, cross_kvs, cross_mask, start,
        jnp.asarray(0), jax.random.PRNGKey(3), max_tokens, 3.0, 0.0,
        35, int(data.audio_eos_value), int(data.audio_pad_value),
        int(data.audio_bos_value), tuple(data.delay_pattern))
    ref = np.asarray(buf)[1: int(n) + 1]

    outs, _ = _dia_batch_decode(model, [text], [3], slots=2,
                                max_tokens=max_tokens, temperature=0.0)
    np.testing.assert_array_equal(outs[0], ref)


def test_dia_batcher_batched_equals_sequential(tiny_dia):
    """Fixed per-request seeds ⇒ sampled batched frames == one-slot pool."""
    texts = ["[S1] First one. [S2] Yes.", "[S1] Second, longer text. [S2] No."]
    seeds = [5, 9]
    batched, steps = _dia_batch_decode(tiny_dia, texts, seeds, slots=2)
    for text, seed, ref in zip(texts, seeds, batched):
        alone, _ = _dia_batch_decode(tiny_dia, [text], [seed], slots=2)
        np.testing.assert_array_equal(alone[0], ref)
    assert steps <= 8


def test_dia_generate_routes_through_batcher(tiny_dia):
    """End-to-end: Model.generate with an installed batcher produces audio
    via lock-step batched CFG ticks."""
    from mlx_audio_tpu.serving import get_infer_hook

    batcher = tiny_dia.make_batcher(slots=2, tick_frames=4,
                                    max_tokens_cap=64)
    batcher.install()
    try:
        assert get_infer_hook(tiny_dia) is batcher
        results = list(tiny_dia.generate("[S1] Hello. [S2] Hi.",
                                         max_tokens=12, temperature=1.0))
        assert batcher.steps > 0
        for r in results:
            assert r.samples > 0
    finally:
        batcher.close()
    assert get_infer_hook(tiny_dia) is None
