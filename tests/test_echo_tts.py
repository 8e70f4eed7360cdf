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


def test_find_flattening_point_and_crop():
    """Matches the reference python-loop semantics
    (echo_tts/audio.py:44-67): first window of near-constant frames at the
    target value ends the speech region; audio crops at 2048 samples/frame."""
    from mlx_audio_tpu.tts.models.echo_tts.echo_tts import Model

    rng = np.random.default_rng(0)
    lat = np.concatenate([
        rng.standard_normal((30, 80)).astype(np.float32),  # speech
        np.zeros((50, 80), np.float32),                    # flat tail
    ])
    fp = Model.find_flattening_point(lat)
    assert fp == 30

    # reference loop semantics check on random latents
    def ref_loop(data, window=20, std_th=0.05, target=0.0):
        padded = np.concatenate([data, np.zeros((window, data.shape[-1]),
                                                np.float32)])
        for i in range(padded.shape[0] - window):
            w = padded[i:i + window]
            if w.std() < std_th and abs(w.mean() - target) < 0.1:
                return i
        return data.shape[0]

    for seed in range(3):
        r = np.random.default_rng(seed)
        cut = int(r.integers(5, 60))
        data = np.concatenate([
            r.standard_normal((cut, 80)).astype(np.float32) * 0.5,
            np.zeros((64 - cut if cut < 64 else 4, 80), np.float32)])
        assert Model.find_flattening_point(data) == ref_loop(data)

    # all-speech latents: no crop
    noisy = rng.standard_normal((40, 80)).astype(np.float32)
    assert Model.find_flattening_point(noisy) == 40

    audio = np.zeros(80 * 2048, np.float32)
    m = object.__new__(Model)
    out = m.crop_audio_to_flattening_point(audio, lat)
    assert out.shape == (30 * 2048,)


def test_echo_batcher_batched_equals_solo():
    """Concurrent same-length generate_latents through EchoBatcher: one
    fused 3B-row CFG integration; per-row noise keys keep batched ==
    solo."""
    import threading

    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook

    seed_rng(81)
    model = Model(tiny_cfg())
    texts = ["[S1] Hello.", "[S1] World."]  # equal byte length → one group
    seeds = [3, 8]
    solo = [np.asarray(model.generate_latents(t, rng_seed=s, _direct=True))
            for t, s in zip(texts, seeds)]

    batcher = model.make_batcher(max_batch=2, window_ms=40.0).install()
    try:
        assert get_infer_hook(model) is batcher
        outs = [None, None]

        def run(i):
            outs[i] = np.asarray(model.generate_latents(
                texts[i], rng_seed=seeds[i]))

        ths = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        [t.start() for t in ths]
        [t.join(timeout=600) for t in ths]
        assert batcher.dispatch_count >= 1
    finally:
        batcher.close()
    assert get_infer_hook(model) is None
    for got, ref in zip(outs, solo):
        np.testing.assert_allclose(got, ref, atol=5e-4)
