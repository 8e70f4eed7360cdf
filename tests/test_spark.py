"""Spark-TTS: FSQ/RFSQ codecs, BiCodec detokenize, prompt building."""

import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.spark import (
    BiCodec,
    FSQ,
    FactorizedVectorQuantize,
    Model,
    ModelConfig,
    ResidualFSQ,
    SpeakerEncoder,
    WaveGenerator,
)
from mlx_audio_tpu.tts.models.spark.spark import FeatDecoder, FeatEncoder


def test_fsq_roundtrip():
    fsq = FSQ([4, 4, 4])
    z = jnp.asarray(np.random.randn(2, 5, 3), jnp.float32)
    q = fsq.quantize(z)
    idx = fsq.codes_to_indices(q)
    assert idx.max() < 64
    back = fsq.indices_to_codes(idx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(q), atol=1e-5)


def test_residual_fsq_roundtrip():
    rfsq = ResidualFSQ(levels=[4, 4, 4], num_quantizers=2, dim=8)
    x = jnp.asarray(np.random.randn(1, 6, 8), jnp.float32)
    out, idx = rfsq(x)
    assert idx.shape == (1, 6, 2)
    back = rfsq.get_output_from_indices(idx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(out), atol=1e-4)


def test_factorized_vq():
    vq = FactorizedVectorQuantize(input_dim=16, codebook_size=32,
                                  codebook_dim=8)
    z = jnp.asarray(np.random.randn(1, 10, 16), jnp.float32)
    idx = vq.tokenize(z)
    assert idx.shape == (1, 10) and idx.max() < 32
    out = vq.detokenize(idx)
    assert out.shape == (1, 10, 16)


def make_bicodec():
    enc = FeatEncoder(input_channels=16, vocos_dim=16,
                      vocos_intermediate_dim=32, vocos_num_layers=1,
                      out_channels=8, sample_ratios=[2])
    quant = FactorizedVectorQuantize(input_dim=8, codebook_size=32,
                                     codebook_dim=4)
    spk = SpeakerEncoder(input_dim=128, out_dim=16, latent_dim=8,
                         token_num=4, fsq_levels=[4, 4], ecapa_channels=8)
    prenet = FeatDecoder(input_channels=8, vocos_dim=16,
                         vocos_intermediate_dim=32, vocos_num_layers=1,
                         out_channels=16, condition_dim=16,
                         sample_ratios=[2])
    postnet = FeatDecoder(input_channels=16, vocos_dim=16,
                          vocos_intermediate_dim=32, vocos_num_layers=1,
                          out_channels=16)
    wave = WaveGenerator(input_channel=16, channels=16, rates=[4, 2],
                         kernel_sizes=[8, 4])
    return BiCodec(enc, wave, quant, spk, prenet, postnet,
                   mel_params=dict(sample_rate=16000, n_fft=256,
                                   hop_length=80, num_mels=128))


def test_bicodec_detokenize():
    bc = make_bicodec()
    semantic = jnp.asarray(np.random.randint(0, 32, (1, 6)), jnp.int32)
    global_toks = jnp.asarray(np.random.randint(0, 16, (1, 4, 1)), jnp.int32)
    wav = bc.detokenize(semantic, global_toks)
    # 6 tokens → ×2 prenet upsample → ×8 wave upsample
    assert wav.shape == (1, 6 * 2 * 4 * 2)
    assert np.isfinite(np.asarray(wav)).all()


def test_prompt_building():
    m = Model(ModelConfig(llm=dict(vocab_size=100, hidden_size=16,
                                   intermediate_size=32,
                                   num_hidden_layers=1,
                                   num_attention_heads=2,
                                   num_key_value_heads=2)))
    p = m.process_prompt_control("hi", gender="male", pitch="low",
                                 speed="high")
    assert "<|gender_1|>" in p and "<|pitch_label_1|>" in p
    p2 = m.process_prompt("hi", np.array([1, 2, 3]))
    assert "<|bicodec_global_2|>" in p2


def test_float_controls_snap_to_levels():
    """Continuous pitch/speed (e.g. the OpenAI speech API's 0.25-4.0 range)
    snap to the nearest control level instead of raising."""
    from mlx_audio_tpu.tts.models.spark.spark import PITCH_MAP

    assert PITCH_MAP[min(PITCH_MAP, key=lambda k: abs(k - 1.2))] == "moderate"
    assert PITCH_MAP[min(PITCH_MAP, key=lambda k: abs(k - 0.25))] in ("very_low", "low")


def test_get_ref_clip_fixed_length_and_tiling():
    """Speaker-reference clip is ref_segment_duration seconds rounded to a
    whole number of latent hops; short audio tiles (reference
    audio_tokenizer.py:40-53)."""
    bc = make_bicodec()
    bc.ref_clip_params = dict(sample_rate=16000, ref_segment_duration=6,
                              latent_hop_length=320)
    expect = 16000 * 6 // 320 * 320
    long = np.random.randn(16000 * 10).astype(np.float32)
    clip = bc.get_ref_clip(long)
    assert clip.shape == (expect,)
    assert np.array_equal(clip, long[:expect])
    short = np.random.randn(1000).astype(np.float32)
    clip2 = bc.get_ref_clip(short)
    assert clip2.shape == (expect,)
    assert np.array_equal(clip2[:1000], short)
    assert np.array_equal(clip2[1000:2000], short)  # tiled, not zero-padded
