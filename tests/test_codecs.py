"""Codec shape/round-trip tests with random weights (reference strategy:
codec/tests/test_descript.py etc. — encode/decode shapes, not quality)."""

import numpy as np
import pytest

from mlx_audio_tpu.codec.models import DAC, SNAC, Encodec, EncodecConfig


@pytest.fixture(scope="module")
def dac():
    return DAC(
        encoder_dim=16, encoder_rates=[2, 4, 5, 8], decoder_dim=128,
        decoder_rates=[8, 5, 4, 2], n_codebooks=4, codebook_size=64,
        codebook_dim=8, sample_rate=44100,
    )


def test_dac_encode_decode_shapes(dac):
    T = dac.hop_length * 10
    audio = np.random.default_rng(0).standard_normal((1, 1, T)).astype(np.float32) * 0.1
    z, codes, latents, _, _ = dac.encode(audio)
    assert z.shape == (1, dac.latent_dim, 10)
    assert codes.shape == (1, 4, 10)
    assert latents.shape == (1, 4 * 8, 10)
    out = dac.decode(z)
    assert out.shape[0] == 1 and out.shape[1] == 1
    assert abs(out.shape[2] - T) <= dac.hop_length


def test_dac_codes_roundtrip(dac):
    T = dac.hop_length * 8
    audio = np.random.default_rng(1).standard_normal((1, 1, T)).astype(np.float32) * 0.1
    _, codes, _, _, _ = dac.encode(audio)
    wav = dac.decode_codes(codes)
    assert wav.shape[1] == 1
    assert np.isfinite(np.asarray(wav)).all()
    # codes are integer indices within codebook
    c = np.asarray(codes)
    assert c.min() >= 0 and c.max() < 64


def test_dac_call_dict(dac):
    T = 1000
    audio = np.zeros((1, 1, T), np.float32)
    out = dac(audio)
    assert out["audio"].shape == (1, 1, T)


@pytest.fixture(scope="module")
def encodec():
    cfg = EncodecConfig(
        num_filters=8, hidden_size=32, codebook_size=64, codebook_dim=32,
        num_lstm_layers=1, upsampling_ratios=[8, 5, 4, 2],
        target_bandwidths=[0.3, 1.0], sampling_rate=16000,
    )
    return Encodec(cfg)


def test_encodec_roundtrip(encodec):
    audio = np.random.default_rng(2).standard_normal((1, 1, 3200)).astype(np.float32) * 0.1
    codes, scales = encodec.encode(audio)
    assert codes.ndim == 4  # (frames, B, nq, T')
    assert codes.shape[0] == 1 and codes.shape[1] == 1
    wav = encodec.decode(codes, scales)
    assert wav.shape[0] == 1 and wav.shape[1] == 1
    assert np.isfinite(np.asarray(wav)).all()


def test_encodec_bandwidth_selects_quantizers(encodec):
    audio = np.zeros((1, 1, 3200), np.float32)
    c1, _ = encodec.encode(audio, bandwidth=0.3)
    c2, _ = encodec.encode(audio, bandwidth=1.0)
    assert c1.shape[2] < c2.shape[2]


@pytest.fixture(scope="module")
def snac():
    return SNAC(
        sampling_rate=24000, encoder_dim=16, encoder_rates=[2, 4, 4],
        decoder_dim=128, decoder_rates=[4, 4, 2], attn_window_size=4,
        codebook_size=64, codebook_dim=8, vq_strides=[4, 2, 1],
        noise=True, depthwise=True,
    )


def test_snac_encode_decode(snac):
    T = snac.hop_length * 16
    audio = np.random.default_rng(3).standard_normal((1, 1, T)).astype(np.float32) * 0.1
    codes = snac.encode(audio)
    assert len(codes) == 3
    # multi-scale: coarser codebooks have fewer frames
    assert codes[0].shape[-1] * 4 == codes[2].shape[-1]
    wav = snac.decode(codes)
    assert wav.shape[1] == 1
    assert np.isfinite(np.asarray(wav)).all()


def test_vocos_mel_decode():
    from mlx_audio_tpu.codec.models.vocos.vocos import (
        ISTFTHead,
        MelSpectrogramFeatures,
        Vocos,
        VocosBackbone,
    )

    fe = MelSpectrogramFeatures(sample_rate=24000, n_fft=256, hop_length=64, n_mels=20)
    backbone = VocosBackbone(
        input_channels=20, dim=32, intermediate_dim=64, num_layers=2
    )
    head = ISTFTHead(dim=32, n_fft=256, hop_length=64)
    v = Vocos(fe, backbone, head)
    audio = np.random.default_rng(4).standard_normal(64 * 50).astype(np.float32) * 0.1
    out = v(audio)
    assert out.ndim == 2  # (B, T)
    assert np.isfinite(np.asarray(out)).all()
    # output within ~one hop of input length
    assert abs(out.shape[-1] - len(audio)) <= 256


def test_weight_norm_fold_helper():
    from mlx_audio_tpu.codec.models.base import fold_weight_norm_pairs

    v = np.random.default_rng(5).standard_normal((8, 3, 4)).astype(np.float32)
    # conv convention: g (8,1,1); norm over (1,2)
    g = 2.0 * np.ones((8, 1, 1), np.float32)
    out = fold_weight_norm_pairs({"c.weight_v": v, "c.weight_g": g})
    w = out["c.weight"]
    np.testing.assert_allclose(np.sqrt((w**2).sum(axis=(1, 2))), 2.0, rtol=1e-5)
    # convT convention: g (1,1,4); norm over (0,1)
    g2 = 3.0 * np.ones((1, 1, 4), np.float32)
    out2 = fold_weight_norm_pairs({"c.weight_v": v, "c.weight_g": g2})
    w2 = out2["c.weight"]
    np.testing.assert_allclose(np.sqrt((w2**2).sum(axis=(0, 1))), 3.0, rtol=1e-5)


def test_bigvgan_generator():
    import jax.numpy as jnp

    from mlx_audio_tpu.codec.models.bigvgan import BigVGAN, BigVGANConfig

    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=16, resblock="1",
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        activation="snakebeta", snake_logscale=True)
    m = BigVGAN(cfg)
    mel = jnp.asarray(np.random.randn(1, 20, 8), jnp.float32)
    wav = m(mel)
    assert wav.shape == (1, 160, 1)
    assert (np.abs(np.asarray(wav)) <= 1.0).all()  # tanh output
    # weight-norm folding path
    from mlx_audio_tpu.nn.module import flatten_params

    flat = flatten_params(m)
    wn = {}
    for k, v in flat.items():
        if k.endswith("conv_pre.weight"):
            g = np.linalg.norm(np.asarray(v).reshape(v.shape[0], -1), axis=1,
                               keepdims=True)[:, :, None]
            wn[k.replace(".weight", ".weight_g")] = jnp.asarray(g)
            wn[k.replace(".weight", ".weight_v")] = v / jnp.asarray(g)
        else:
            wn[k] = v
    fixed = m.sanitize(wn)
    np.testing.assert_allclose(np.asarray(fixed["conv_pre.weight"]),
                               np.asarray(flat["conv_pre.weight"]), rtol=1e-5)


def test_dacvae_roundtrip_shapes():
    import jax.numpy as jnp

    from mlx_audio_tpu.codec.models.dacvae import DACVAE, DACVAEConfig

    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=[2, 3], latent_dim=32,
                       decoder_dim=24, decoder_rates=[3, 2], codebook_dim=8)
    m = DACVAE(cfg)
    wav = jnp.asarray(np.random.randn(1, 60, 1).astype(np.float32)) * 0.1
    lat = m.encode(wav)
    # (k-stride)//2 internal padding (reference codec.py:91-94) → 9 frames
    assert lat.shape == (1, 8, 9)
    out = m.decode(lat)
    assert out.shape[0] == 1 and out.shape[2] == 1
    assert (np.abs(np.asarray(out)) <= 1.0).all()


def test_fish_s1_dac_roundtrip():
    import jax.numpy as jnp

    from mlx_audio_tpu.codec.models.fish_s1_dac import (
        DownsampleResidualVectorQuantize,
        FishS1DAC,
        WindowLimitedTransformer,
    )
    from mlx_audio_tpu.codec.models.fish_s1_dac.fish_s1_dac import ModelArgs

    q_cfg = ModelArgs(n_layer=1, n_head=2, dim=16, intermediate_size=32)
    quant = DownsampleResidualVectorQuantize(
        input_dim=16, n_codebooks=2, codebook_size=32, codebook_dim=4,
        semantic_codebook_size=64, downsample_factor=(2,),
        pre_module=WindowLimitedTransformer(q_cfg, input_dim=16,
                                            window_size=8),
        post_module=WindowLimitedTransformer(q_cfg, input_dim=16,
                                             window_size=8))
    m = FishS1DAC(encoder_dim=2, encoder_rates=[2, 4], latent_dim=16,
                  decoder_dim=16, decoder_rates=[4, 2], quantizer=quant,
                  encoder_transformer_layers=[0, 1])
    audio = jnp.asarray(np.random.randn(1, 256).astype(np.float32)) * 0.1
    codes = m.encode(audio)
    assert codes.shape[1] == 3  # semantic + 2 residual books
    assert codes.max() < 64
    out = m.decode(codes)
    assert out.shape == (1, 256, 1)
    # decode is deterministic from codes
    out2 = m.decode(codes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_dacvae_chunked_decode_stitching_exact():
    """Chunked decode == manual per-chunk decode + linear crossfade.

    Truncated non-causal decodes legitimately differ from the full decode
    within the conv stack's receptive field (which exceeds these tiny
    shapes entirely), so closeness-to-full is not a valid oracle; the
    contract is the stitching math itself (reference codec.py:1064-1160:
    independent chunk decodes, linear crossfade over overlap*hop samples).
    """
    from mlx_audio_tpu.codec.models.dacvae.dacvae import DACVAE, DACVAEConfig

    import jax.numpy as jnp

    # even strides: conv-transpose lengths are exactly frames*hop, so
    # chunk stitching is length-exact (the real config's rates are even)
    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=[2, 2], latent_dim=32,
                       decoder_dim=24, decoder_rates=[2, 2], codebook_dim=8)
    m = DACVAE(cfg)
    lat = jnp.asarray(np.random.randn(1, 8, 40).astype(np.float32) * 0.1)
    full = np.asarray(m.decode(lat))
    chunk_size, overlap = 16, 4
    chunked = np.asarray(m.decode(lat, chunk_size=chunk_size))
    assert chunked.shape == full.shape

    # manual reference stitch with the same boundaries
    hop = cfg.hop_length
    ov = overlap * hop
    starts = []
    s = 0
    while s < lat.shape[-1]:
        starts.append(s)
        e = min(s + chunk_size, lat.shape[-1])
        if e >= lat.shape[-1]:
            break
        s = e - overlap
    decs = [np.asarray(m.decode(lat[:, :, s:min(s + chunk_size,
                                                lat.shape[-1])]))
            for s in starts]
    fade_in = np.linspace(0.0, 1.0, ov)[None, :, None]
    expect = decs[0].copy()
    for d in decs[1:]:
        seam = expect[:, -ov:] * (1 - fade_in) + d[:, :ov] * fade_in
        expect = np.concatenate([expect[:, :-ov], seam, d[:, ov:]], axis=1)
    np.testing.assert_allclose(chunked, expect, atol=1e-5)


def test_dacvae_streaming_decode_matches_chunked():
    import jax.numpy as jnp
    from mlx_audio_tpu.codec.models.dacvae.dacvae import DACVAE, DACVAEConfig

    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=[2, 2], latent_dim=32,
                       decoder_dim=24, decoder_rates=[2, 2], codebook_dim=8)
    m = DACVAE(cfg)
    lat = jnp.asarray(np.random.randn(1, 8, 40).astype(np.float32) * 0.1)
    chunked = np.asarray(m.decode(lat, chunk_size=16))
    pieces = list(m.decode_streaming(lat, chunk_size=16))
    assert pieces[-1][1] and not pieces[0][1]
    streamed = np.concatenate([np.asarray(p) for p, _ in pieces], axis=1)
    assert streamed.shape == chunked.shape
    assert np.allclose(streamed, chunked, atol=1e-5)
    # frame/sample index converters
    assert m.wav_idx_to_feature_idx(40) == 10
    assert m.feature_idx_to_wav_idx(10) == 40


def test_dac_compress_decompress_roundtrip(dac, tmp_path):
    """DACFile .dac format save/load + compress/decompress with loudness
    restoration (reference descript/base.py:14-233)."""
    from mlx_audio_tpu.codec.models.descript.dac import DACFile

    sr = dac.sample_rate
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(sr // 2).astype(np.float32) * 0.05)

    f = dac.compress(wav, win_duration=1.0)
    assert f.codes.ndim == 3 and f.codes.shape[1] == 4
    assert f.padding is True  # short signal: whole-signal path

    p = f.save(tmp_path / "clip")
    assert p.suffix == ".dac"
    loaded = DACFile.load(p)
    assert np.array_equal(loaded.codes, f.codes.astype(np.int32))
    assert loaded.sample_rate == sr

    out = dac.decompress(loaded)
    assert out.ndim == 2 and out.shape[0] == 1
    assert out.shape[1] == len(wav)

    # long signal: windowed path, multiple chunks
    wav2 = rng.standard_normal(int(sr * 2.5)).astype(np.float32) * 0.05
    f2 = dac.compress(wav2, win_duration=1.0, n_quantizers=2)
    assert f2.padding is False and f2.codes.shape[1] == 2
    out2 = dac.decompress(f2)
    assert abs(out2.shape[1] - len(wav2)) <= dac.hop_length * 2


def test_snac_decode_stream_continuity(snac):
    """Streamed chunk decode (context re-decode + crop) concatenates to the
    same total sample count as offline decode; interior samples past the
    receptive-field boundary match (reference snac/snac.py:106-161)."""
    rng = np.random.default_rng(7)
    T = snac.hop_length * 32
    audio = rng.standard_normal((1, 1, T)).astype(np.float32) * 0.1
    codes = snac.encode(audio)
    full = np.asarray(snac.decode(codes))

    # split codes into two chunks at a z-frame boundary (16 z-frames each)
    half_z = 16
    chunk_a = [c[:, : half_z // s] for c, s in zip(codes, snac.vq_strides)]
    chunk_b = [c[:, half_z // s:] for c, s in zip(codes, snac.vq_strides)]

    out_a, ctx = snac.decode_stream(chunk_a, None, context_frames=8)
    out_b, ctx = snac.decode_stream(chunk_b, ctx, context_frames=8)
    total = np.concatenate([np.asarray(out_a), np.asarray(out_b)], axis=-1)
    assert total.shape == full.shape
    assert ctx[0].shape[1] <= 8


def test_dacvae_decode_stream_callback_and_random_message():
    """Callback streaming wrapper totals match generator output; watermark
    payload sampling (reference codec.py:771-773, 1302-1340)."""
    import jax.numpy as jnp

    from mlx_audio_tpu.codec.models.dacvae.dacvae import (
        DACVAE,
        DACVAEConfig,
        MsgProcessor,
    )

    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=[2, 2], latent_dim=32,
                       decoder_dim=24, decoder_rates=[2, 2], codebook_dim=8)
    m = DACVAE(cfg)
    lat = jnp.asarray(np.random.randn(1, 8, 40).astype(np.float32) * 0.1)
    got = []
    total = m.decode_stream(lat, lambda c, i, last: got.append(
        (np.asarray(c), i, last)), chunk_size=16)
    assert got[-1][2] and not got[0][2]
    assert total == sum(c.shape[1] for c, _, _ in got)
    assert [i for _, i, _ in got] == list(range(len(got)))

    mp = MsgProcessor(nbits=16, hidden_size=8)
    msg = mp.random_message(3, seed=1)
    assert msg.shape == (3, 16)
    assert set(np.unique(np.asarray(msg))) <= {0, 1}
