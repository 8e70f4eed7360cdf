"""Kokoro model tests: wiring/shapes with random weights (reference test
strategy: tts/tests/test_models.py Kokoro init), alignment vectorization,
G2P/pipeline chunking, sanitize mapping."""

import numpy as np
import pytest

import mlx_audio_tpu.tts.models.kokoro.kokoro as kokoro_mod
from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig
from mlx_audio_tpu.tts.models.kokoro.g2p import BasicEnglishG2P
from mlx_audio_tpu.tts.models.kokoro.pipeline import KokoroPipeline


VOCAB = {c: i + 1 for i, c in enumerate(
    "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðʃʒʧʤˈˌAIOW !\"(),.:;?"
)}


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    cfg = ModelConfig(
        istftnet=dict(
            resblock_kernel_sizes=[3],
            upsample_rates=[4, 2],
            upsample_initial_channel=512,
            resblock_dilation_sizes=[[1, 3, 5]],
            upsample_kernel_sizes=[8, 4],
            gen_istft_n_fft=16,
            gen_istft_hop_size=4,
        ),
        dim_in=32,
        hidden_dim=64,
        style_dim=32,
        n_layer=1,
        max_dur=10,
        n_token=178,
        text_encoder_kernel_size=5,
        plbert=dict(
            hidden_size=64,
            num_attention_heads=2,
            intermediate_size=128,
            max_position_embeddings=512,
            num_hidden_layers=1,
            embedding_size=32,
            dropout=0.0,
        ),
        vocab=VOCAB,
    )
    # small frame buckets so CPU tests stay fast
    kokoro_mod.FRAME_BUCKETS = (64, 128, 256)
    return Model(cfg)


def test_forward_produces_audio(tiny_model):
    ref_s = np.random.default_rng(0).standard_normal((1, 64)).astype(np.float32)
    out = tiny_model("həlˈO wˈɜɹld", ref_s, return_output=True)
    # total upsample = 4*2*4 = 32 per F0 frame; 64 per text frame
    assert out.audio.ndim == 1
    assert out.audio.shape[0] == out.pred_dur.sum() * 64
    assert np.isfinite(out.audio).all()
    assert (out.pred_dur[1:-1] >= 1).all()


def test_speed_scales_duration(tiny_model):
    ref_s = np.zeros((1, 64), np.float32)
    slow = tiny_model("həlˈO", ref_s, speed=0.5, return_output=True)
    fast = tiny_model("həlˈO", ref_s, speed=2.0, return_output=True)
    assert slow.pred_dur.sum() > fast.pred_dur.sum()


def test_alignment_matches_repeat_loop(tiny_model):
    """The vectorized interval alignment equals the reference's repeat-based
    construction (kokoro.py:142-148)."""
    import jax.numpy as jnp

    dur = np.array([[2, 3, 1, 0, 0]], np.int32)
    T_frames = 8
    ends = np.cumsum(dur[0])
    starts = ends - dur[0]
    fidx = np.arange(T_frames)
    ours = ((fidx[None] >= starts[:, None]) & (fidx[None] < ends[:, None])).astype(int)
    # reference: indices = concat([repeat(i, n)]); A[indices, arange] = 1
    ref = np.zeros((5, T_frames), int)
    col = 0
    for i, n in enumerate(dur[0]):
        for _ in range(int(n)):
            ref[i, col] = 1
            col += 1
    np.testing.assert_array_equal(ours, ref)


def test_g2p_basic():
    g2p = BasicEnglishG2P()
    ps, tokens = g2p("Hello world!")
    assert "h" in ps and len(tokens) == 3
    assert tokens[-1].phonemes == "!"
    # numbers are spelled out
    ps2, _ = g2p("3 dogs")
    assert "θɹ" in ps2  # "three"


def test_pipeline_chunking_long_text(tiny_model, tmp_path):
    # voice pack: (510, 1, 64) style vectors
    pack = np.zeros((510, 1, 64), np.float32)
    np.savez(tmp_path / "af_test.npz", voice=pack)
    pipe = KokoroPipeline(lang_code="a", model=None, repo_id=str(tmp_path))
    from mlx_audio_tpu.tts.models.kokoro.g2p import PhonemeToken

    tokens = [
        PhonemeToken(text="word", phonemes="wˈɜɹd", whitespace=" ")
        for _ in range(200)
    ] + [PhonemeToken(text=".", phonemes=".", whitespace=" ")]
    chunks = list(pipe.en_tokenize(tokens))
    assert len(chunks) >= 2
    for _, ps, _ in chunks:
        assert len(ps) <= 510


def test_generate_end_to_end(tiny_model, tmp_path):
    voices = tmp_path / "voices"
    voices.mkdir()
    pack = np.random.default_rng(1).standard_normal((510, 1, 64)).astype(np.float32) * 0.1
    np.savez(voices / "af_heart.npz", voice=pack)
    tiny_model.repo_id = str(tmp_path)
    results = list(tiny_model.generate("Hello world.", voice="af_heart"))
    assert len(results) == 1
    r = results[0]
    assert r.samples > 0 and r.sample_rate == 24000
    assert np.isfinite(r.audio).all()
    assert r.real_time_factor > 0


def test_sanitize_folds_weight_norm_and_lstm_keys(tiny_model):
    # torch layout (O, I, K) for decoder.encode.conv1: Conv1d(66, 1024, 3)
    v = np.random.default_rng(2).standard_normal((1024, 66, 3)).astype(np.float32)
    g = np.ones((1024, 1, 1), np.float32)
    weights = {
        "decoder.encode.conv1.weight_v": v,
        "decoder.encode.conv1.weight_g": g,
        "predictor.lstm.weight_ih_l0": np.zeros((4, 2), np.float32),
        "predictor.lstm.weight_hh_l0_reverse": np.zeros((4, 1), np.float32),
        "bert.embeddings.position_ids": np.zeros(5),
    }
    out = tiny_model.sanitize(dict(weights))
    assert "decoder.encode.conv1.weight" in out
    assert "decoder.encode.conv1.weight_v" not in out
    w = out["decoder.encode.conv1.weight"]
    # folded: g * v / ||v|| with g=1 → rows have unit norm, torch (O,I,K) → (O,K,I)
    assert w.shape == (1024, 3, 66)
    norms = np.sqrt((w**2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert "predictor.lstm.forward.Wx" in out
    assert "predictor.lstm.backward.Wh" in out
    assert not any("position_ids" in k for k in out)


def test_bf16_inference_matches_f32(tiny_model):
    """cast_floats(model) must produce audio close to the f32 path (the
    BASELINE headline config is bf16): phase-critical paths pin to f32."""
    import jax.numpy as jnp

    from mlx_audio_tpu.nn.module import cast_floats

    ref_s = np.random.default_rng(1).standard_normal((1, 64)).astype(np.float32) * 0.1
    ps = "ðə kwˈɪk bɹˈWn fˈɑks ʤˈʌmps"
    a32 = tiny_model(ps, ref_s)
    mb = cast_floats(tiny_model)
    assert mb.bert_encoder.weight.dtype == jnp.bfloat16
    a16 = mb(ps, ref_s)
    n = min(len(a32), len(a16))
    assert np.isfinite(a16).all()
    # same duration predictions → same length
    assert abs(len(a32) - len(a16)) <= 64 * 2
    corr = np.corrcoef(a32[:n], a16[:n])[0, 1]
    assert corr > 0.98, corr


def test_fused_forward_matches_two_stage(tiny_model):
    """fused_frames path (one dispatch) equals the two-stage path; overflow
    falls back to exact synthesis."""
    ref_s = np.random.default_rng(4).standard_normal((1, 64)).astype(np.float32) * 0.1
    ps = "ðə kwˈɪk bɹˈWn fˈɑks"
    two = tiny_model(ps, ref_s, return_output=True)
    fused = tiny_model(ps, ref_s, return_output=True, fused_frames=256)
    assert np.array_equal(two.pred_dur, fused.pred_dur)
    assert len(two.audio) == len(fused.audio)
    n = len(two.audio)
    corr = np.corrcoef(two.audio[:n], fused.audio[:n])[0, 1]
    assert corr > 0.999, corr
    # overflow path: tiny fused budget → falls back, still exact length
    fb = tiny_model(ps, ref_s, return_output=True, fused_frames=1)
    assert len(fb.audio) == len(two.audio)


def test_frame_bucket_overflow_rounds_up():
    """Totals beyond the bucket table round UP (never clamp → no audio
    truncation, valid_frac stays <= 1)."""
    from mlx_audio_tpu.tts.models.kokoro.kokoro import FRAME_BUCKETS, _bucket

    assert _bucket(3072, FRAME_BUCKETS) == 3072
    assert _bucket(3073, FRAME_BUCKETS) >= 3073
    assert _bucket(5000, FRAME_BUCKETS) >= 5000


def test_generate_from_tokens_raw_phonemes(tiny_model, tmp_path):
    """Pre-phonemized input bypasses G2P (reference pipeline.py:268-320)."""
    voices = tmp_path / "voices"
    voices.mkdir()
    pack = np.random.default_rng(2).standard_normal(
        (510, 1, 64)).astype(np.float32) * 0.1
    np.savez(voices / "af_heart.npz", voice=pack)
    pipe = KokoroPipeline(lang_code="a", model=tiny_model,
                          repo_id=str(tmp_path))
    results = list(pipe.generate_from_tokens("hˈɛlɑW", voice="af_heart"))
    assert len(results) == 1
    assert results[0].phonemes == "hˈɛlɑW"
    assert results[0].audio is not None
    assert np.isfinite(np.asarray(results[0].audio)).all()

    # over-long phoneme strings raise (reference :300)
    import pytest

    with pytest.raises(ValueError):
        list(pipe.generate_from_tokens("a" * 511, voice="af_heart"))

    # token-list path chunks and synthesizes
    from mlx_audio_tpu.tts.models.kokoro.g2p import PhonemeToken

    tokens = [PhonemeToken(text="hi", phonemes="hˈaJ", whitespace=" ")]
    out = list(pipe.generate_from_tokens(tokens, voice="af_heart"))
    assert len(out) == 1 and out[0].audio is not None
