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


def test_token_parser_full_vocabulary():
    """Full control-token vocabulary (reference utils/token_parser.py)."""
    from mlx_audio_tpu.tts.models.spark.token_parser import (
        EMO_MAP, LEVELS_MAP_UI, TASK_TOKEN_MAP, TokenParser)

    assert TASK_TOKEN_MAP["speech_edit"] == "<|task_edit|>"
    assert TokenParser.task("controllable_tts") == "<|task_controllable_tts|>"
    assert TokenParser.age("Middle-aged") == "<|age_3|>"
    assert TokenParser.gender("female") == "<|gender_0|>"
    assert TokenParser.emotion("WHISPER") == "<|emotion_16|>"
    assert len(EMO_MAP) == 25 and EMO_MAP["CONTEMPT"] == 24
    # values clamp to their documented ranges
    assert TokenParser.mel_value(-5) == "<|pitch_value_0|>"
    assert TokenParser.mel_value(9999) == "<|pitch_value_1000|>"
    assert TokenParser.loudness_value(31) == "<|loudness_value_30|>"
    assert TokenParser.speed_value(11) == "<|speed_value_10|>"
    assert TokenParser.pitch_var_value(7) == "<|pitch_var_value_7|>"
    # level renderers share LEVELS_MAP
    assert TokenParser.mel_level("high") == "<|pitch_label_3|>"
    assert TokenParser.loudness_level("very_low") == "<|loudness_label_0|>"
    assert TokenParser.speed_level("very_high") == "<|speed_label_4|>"
    assert TokenParser.pitch_var_level("low") == "<|pitch_var_label_1|>"
    assert LEVELS_MAP_UI == {1: "very_low", 2: "low", 3: "moderate",
                             4: "high", 5: "very_high"}


def test_spark_file_helpers_roundtrip(tmp_path):
    """JSONL / metadata / CSV round-trips and YAML base_config merge
    (reference utils/file.py)."""
    from mlx_audio_tpu.tts.models.spark import files as sf

    rows = [{"index": "a", "text": "hi|there", "n": 1},
            {"index": "b", "emo": "HAPPY"}]
    jl = tmp_path / "m.jsonl"
    sf.write_jsonl(rows, jl)
    assert sf.read_jsonl(jl) == rows

    jpath = tmp_path / "m.json"
    jpath.write_text('{"b": {"x": 2}, "a": {"x": 1}}')
    assert sf.read_json_as_jsonl(jpath) == [
        {"index": "a", "x": 1}, {"index": "b", "x": 2}]

    assert sf.decode_unicode_strings({"s": "caf\\u00e9", "n": 3}) == {
        "s": "café", "n": 3}

    csvp = tmp_path / "m.csv"
    sf.jsonl_to_csv(jl, csvp)
    header = csvp.read_text().splitlines()[0]
    assert header == "emo,index,n,text"  # sorted union of keys

    meta = tmp_path / "meta.txt"
    sf.save_metadata(rows, meta, headers=["index", "text"])
    got, headers = sf.read_metadata(meta)
    assert headers == ["index", "text"]
    assert got[0] == {"index": "a", "text": "hi there"}  # '|' sanitized

    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnest: {x: 1, y: 2}\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"base_config: {base}\nnest: {{y: 9}}\nb: 2\n")
    cfg = sf.load_config(child)
    assert cfg["a"] == 1 and cfg["b"] == 2
    assert cfg["nest"] == {"x": 1, "y": 9}
