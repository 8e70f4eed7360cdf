"""SAM-Audio: T5 encoder, DiT, anchors, ODE separation, long/streaming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.codec.models.dacvae.dacvae import DACVAEConfig
from mlx_audio_tpu.sts.models.sam_audio import (
    DiT,
    SAMAudio,
    SAMAudioConfig,
    SAMAudioProcessor,
    T5Config,
    T5Encoder,
    T5EncoderConfig,
    TransformerConfig,
)


def tiny_config():
    codec = DACVAEConfig(encoder_dim=8, encoder_rates=[2, 3], latent_dim=32,
                         decoder_dim=24, decoder_rates=[3, 2],
                         codebook_dim=8, sample_rate=48000)
    t5 = T5Config(vocab_size=50, d_model=16, d_kv=4, d_ff=32,
                  num_layers=2, num_heads=4)
    return SAMAudioConfig(
        in_channels=6 * 8,
        audio_codec=codec,
        text_encoder=T5EncoderConfig(dim=16, t5=t5),
        transformer=TransformerConfig(
            dim=32, n_heads=4, n_layers=2, context_dim=32,
            out_channels=16, frequency_embedding_dim=16),
        num_anchors=3, anchor_embedding_dim=8)


class FakeT5Tokenizer:
    def __call__(self, texts, **kw):
        ids = [[min(ord(c) % 49 + 1, 49) for c in t[:8]] + [1]
               for t in texts]
        width = max(len(i) for i in ids)
        input_ids = np.zeros((len(ids), width), np.int64)
        mask = np.zeros((len(ids), width), np.int64)
        for r, i in enumerate(ids):
            input_ids[r, : len(i)] = i
            mask[r, : len(i)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


def test_t5_encoder_shapes_and_mask():
    t5 = T5Encoder(T5Config(vocab_size=50, d_model=16, d_kv=4, d_ff=32,
                            num_layers=2, num_heads=4))
    ids = jnp.asarray(np.random.randint(1, 50, (2, 7)))
    mask = jnp.asarray(np.array([[1] * 7, [1] * 4 + [0] * 3]))
    out = t5(ids, mask)
    assert out.shape == (2, 7, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_forward_with_memory():
    dit = DiT(TransformerConfig(dim=32, n_heads=4, n_layers=2,
                                context_dim=32, out_channels=16,
                                frequency_embedding_dim=16))
    x = jnp.zeros((2, 10, 32))
    out = dit(x, jnp.full((2,), 0.5), memory=jnp.ones((2, 3, 32)) * 0.1)
    assert out.shape == (2, 10, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_processor_anchors():
    p = SAMAudioProcessor(audio_hop_length=6, audio_sampling_rate=48000)
    batch = p(["speech"], [np.random.randn(60).astype(np.float32)],
              anchors=[[("+", 0.0, 0.0005)]])
    assert batch.anchor_ids.shape[1] == 3  # null, pad, +
    assert batch.anchor_ids[0, 2] == 1  # "+" token
    # first feature frames point to anchor index 2
    assert batch.anchor_alignment[0, 0] == 2
    # default (no anchors): null + pad only
    b2 = p(["x"], [np.random.randn(30).astype(np.float32)])
    assert b2.anchor_ids.shape == (1, 2)


def test_separate_end_to_end():
    model = SAMAudio(tiny_config())
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    audio = np.random.randn(1, 60, 1).astype(np.float32) * 0.1
    res = model.separate(jnp.asarray(audio), ["a dog barking"],
                         ode_opt={"method": "euler", "step_size": 0.5})
    assert len(res.target) == 1 and len(res.residual) == 1
    assert res.target[0].shape == res.residual[0].shape
    assert np.isfinite(res.target[0]).all()
    # midpoint solver also runs
    res2 = model.separate(jnp.asarray(audio), ["a dog barking"],
                          ode_opt={"method": "midpoint", "step_size": 0.5})
    assert np.isfinite(res2.target[0]).all()


def test_separate_long_crossfade():
    model = SAMAudio(tiny_config())
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    sr = model.sample_rate
    audio = np.random.randn(1, 1, 180).astype(np.float32) * 0.1
    res = model.separate_long(jnp.asarray(audio), ["speech"],
                              chunk_seconds=90 / sr,
                              overlap_seconds=30 / sr,
                              ode_opt={"method": "euler",
                                       "step_size": 0.5})
    assert len(res.target) == 1
    assert res.target[0].shape[0] > 0
    assert np.isfinite(res.target[0]).all()


def test_separate_streaming_chunks():
    model = SAMAudio(tiny_config())
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    sr = model.sample_rate
    audio = np.random.randn(1, 1, 180).astype(np.float32) * 0.1
    chunks = list(model.separate_streaming(
        jnp.asarray(audio), ["speech"], chunk_seconds=90 / sr,
        overlap_seconds=30 / sr,
        ode_opt={"method": "euler", "step_size": 0.5}))
    assert len(chunks) >= 2
    assert chunks[-1].is_last and not chunks[0].is_last
    assert all(np.isfinite(c.target).all() for c in chunks)


def test_separate_bf16_weights():
    """cast_floats(bf16) + bf16 audio must run the whole pipeline."""
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.module import cast_floats

    model = cast_floats(SAMAudio(tiny_config()), jnp.bfloat16)
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    audio = jnp.asarray(
        np.random.randn(1, 60, 1).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    res = model.separate(audio, ["speech"],
                         ode_opt={"method": "euler", "step_size": 0.5})
    out = np.asarray(res.target[0], np.float32)
    assert np.isfinite(out).all()


def test_dit_bf16_dtype_stable():
    """bf16 in → bf16 out: the time/modulation path must not upcast."""
    from mlx_audio_tpu.nn.module import cast_floats

    dit = cast_floats(DiT(TransformerConfig(
        dim=32, n_heads=4, n_layers=2, context_dim=32, out_channels=16,
        frequency_embedding_dim=16)), jnp.bfloat16)
    out = dit(jnp.zeros((1, 6, 32), jnp.bfloat16), jnp.full((1,), 0.5),
              memory=jnp.ones((1, 2, 32), jnp.bfloat16) * 0.1)
    assert out.dtype == jnp.bfloat16


def test_fetch_array_retries_transient_resource_exhausted():
    """fetch_array retries RESOURCE_EXHAUSTED fetches (axon: first transfer
    after a huge program can fail while its workspace drains) and re-raises
    anything else."""
    from mlx_audio_tpu.utils import fetch_array

    class Flaky:
        def __init__(self, failures, msg):
            self.failures, self.msg = failures, msg

        def __array__(self, dtype=None, copy=None):
            if self.failures:
                self.failures -= 1
                raise RuntimeError(self.msg)
            return np.arange(4.0)

    out = fetch_array(Flaky(2, "RESOURCE_EXHAUSTED: TPU backend error"),
                      delay=0.0)
    assert out.tolist() == [0.0, 1.0, 2.0, 3.0]

    with pytest.raises(RuntimeError, match="INTERNAL"):
        fetch_array(Flaky(1, "INTERNAL: other"), delay=0.0)

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        fetch_array(Flaky(99, "RESOURCE_EXHAUSTED"), tries=2, delay=0.0)


def test_separate_streaming_callback_mode():
    """Callback mode returns total samples and invokes both callbacks
    (reference model.py:884-898)."""
    model = SAMAudio(tiny_config())
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    sr = model.sample_rate
    audio = np.random.randn(1, 1, 180).astype(np.float32) * 0.1
    seen_t, seen_r = [], []

    def on_target(chunk, idx, is_last):
        seen_t.append((idx, is_last, np.asarray(chunk).shape[0]))

    def on_residual(chunk, idx, is_last):
        seen_r.append(idx)

    total = model.separate_streaming(
        jnp.asarray(audio), ["speech"],
        target_callback=on_target, residual_callback=on_residual,
        chunk_seconds=90 / sr, overlap_seconds=30 / sr,
        ode_opt={"method": "euler", "step_size": 0.5})
    assert isinstance(total, int) and total > 0
    assert total == sum(s for _, _, s in seen_t)
    assert seen_t[-1][1] is True
    assert [i for i, _, _ in seen_t] == seen_r


def test_separate_streaming_anchor_passthrough():
    """Anchor prompts flow into the chunked ODE path unchanged
    (reference model.py:954-959)."""
    model = SAMAudio(tiny_config())
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    sr = model.sample_rate
    audio = np.random.randn(1, 1, 180).astype(np.float32) * 0.1
    proc = model.processor
    ids, align = proc.process_anchors(
        [[("+", 0.0, 60 / sr)]],
        np.zeros((1, proc.wav_to_feature_idx(180)), bool), 1)
    chunks = list(model.separate_streaming(
        jnp.asarray(audio), ["speech"], anchor_ids=ids,
        anchor_alignment=align, chunk_seconds=90 / sr,
        overlap_seconds=30 / sr,
        ode_opt={"method": "euler", "step_size": 0.5}))
    assert chunks[-1].is_last
    assert all(np.isfinite(c.target).all() for c in chunks)


def test_sam_batcher_batched_equals_solo():
    """Concurrent single-item separations through SAMBatcher: one fused
    ODE batch; per-row noise keys make batched == solo bitwise."""
    import threading

    from mlx_audio_tpu.serving import get_infer_hook

    model = SAMAudio(tiny_config())
    model.text_encoder.set_tokenizer(FakeT5Tokenizer())
    rng = np.random.default_rng(8)
    audios = [rng.standard_normal(60).astype(np.float32) * 0.1
              for _ in range(2)]
    descs = ["a dog barking", "rain on a window"]
    solo = [model.separate([a], [d],
                           noise_keys=[jax.random.PRNGKey(0)], _direct=True)
            for a, d in zip(audios, descs)]

    batcher = model.make_batcher(max_batch=2, window_ms=40.0).install()
    try:
        assert get_infer_hook(model) is batcher
        outs = [None, None]

        def run(i):
            outs[i] = model.separate([audios[i]], [descs[i]])

        ths = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        [t.start() for t in ths]
        [t.join(timeout=600) for t in ths]
        assert batcher.dispatch_count >= 1
    finally:
        batcher.close()
    assert get_infer_hook(model) is None
    import os

    tpu = os.environ.get("MLX_AUDIO_TPU_TESTS") == "1"
    for got, ref in zip(outs, solo):
        # rows share per-request noise, but XLA tiles B=2 matmuls
        # differently than B=1 — equality is to float accumulation order,
        # and the ODE integration compounds it on the chip, so TPU
        # asserts waveform correlation instead of elementwise closeness
        if tpu:
            for g, r in [(got.target[0], ref.target[0]),
                         (got.residual[0], ref.residual[0])]:
                g, r = np.ravel(g), np.ravel(r)
                denom = np.linalg.norm(g) * np.linalg.norm(r) + 1e-9
                assert float(g @ r) / denom > 0.99
        else:
            np.testing.assert_allclose(got.target[0], ref.target[0],
                                       atol=5e-4)
            np.testing.assert_allclose(got.residual[0], ref.residual[0],
                                       atol=5e-4)
