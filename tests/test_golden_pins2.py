"""Golden-fixture regression pins, round 4: the remaining no-torch-twin
families (VERDICT r3 weak-4 list). With these, every L4/L5 family has
either a torch-parity test or a committed <=1e-5 fixture pin (PARITY.md).

Same contract as test_golden_pins.py: each pin stores tiny-config f32
weights + outputs once (tests/golden/*.npz) and asserts <=1e-5 thereafter
— regression pins against this repo's own history, NOT cross-framework
parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from golden_utils import check_golden
from mlx_audio_tpu.nn.layers import seed_rng


def _rng(seed):
    return np.random.default_rng(seed)


def test_golden_cosyvoice2_llm():
    """Qwen2LM speech-token decode (RAS sampling, fixed key)."""
    from test_cosyvoice2 import tiny_config

    from mlx_audio_tpu.tts.models.cosyvoice2 import Qwen2LM

    seed_rng(0)
    lm = Qwen2LM(tiny_config().llm)

    def run(m):
        text = np.array([1, 2, 3, 4], np.int32)
        tokens, count = m.inference(text, max_token_text_ratio=3.0,
                                    min_token_text_ratio=1.0,
                                    key=jax.random.PRNGKey(0))
        return {"tokens": np.asarray(tokens),
                "count": np.asarray(count)}

    check_golden("cosyvoice2_llm", lm, run)


def test_golden_s3tokenizer_v1():
    from mlx_audio_tpu.codec.models.s3tokenizer import (ModelConfig,
                                                        S3Tokenizer)

    seed_rng(0)
    cfg = ModelConfig(n_mels=16, n_audio_state=32, n_audio_head=2,
                      n_audio_layer=1, n_codebook_size=64)
    model = S3Tokenizer("speech_tokenizer_v1_25hz", cfg)
    model.euclid_codebook.embed = jnp.asarray(
        _rng(0).standard_normal((64, 32)).astype(np.float32))

    def run(m):
        mel = _rng(1).standard_normal((1, 16, 100)).astype(np.float32)
        codes, code_len = m.quantize(mel, np.array([100]))
        return {"codes": np.asarray(codes), "len": np.asarray(code_len)}

    check_golden("s3tokenizer_v1", model, run)


def test_golden_s3tokenizer_v2():
    from mlx_audio_tpu.codec.models.s3tokenizer import (ModelConfig,
                                                        S3TokenizerV2)

    seed_rng(0)
    model = S3TokenizerV2(config=ModelConfig(
        n_mels=16, n_audio_state=32, n_audio_head=2, n_audio_layer=1))

    def run(m):
        mel = _rng(2).standard_normal((1, 16, 120)).astype(np.float32)
        codes, code_len = m.quantize(mel, np.array([120]))
        return {"codes": np.asarray(codes), "len": np.asarray(code_len)}

    check_golden("s3tokenizer_v2", model, run)


def test_golden_s3tokenizer_v3():
    from mlx_audio_tpu.codec.models.s3tokenizer import (ModelConfig,
                                                        S3TokenizerV3)

    seed_rng(0)
    model = S3TokenizerV3(config=ModelConfig(
        n_mels=16, n_audio_state=32, n_audio_head=2, n_audio_layer=2))

    def run(m):
        mel = _rng(3).standard_normal((1, 16, 120)).astype(np.float32)
        codes, code_len = m.quantize(mel, np.array([120]))
        return {"codes": np.asarray(codes), "len": np.asarray(code_len)}

    check_golden("s3tokenizer_v3", model, run)


def test_golden_vibevoice_head_vae():
    """VibeVoice diffusion head + acoustic-tokenizer VAE decoder."""
    from mlx_audio_tpu.tts.models.vibevoice import (
        AcousticTokenizer, AcousticTokenizerConfig, DiffusionHead,
        DiffusionHeadConfig)

    from mlx_audio_tpu.nn.module import Module

    class Pair(Module):
        def __init__(self):
            self.head = DiffusionHead(DiffusionHeadConfig(
                hidden_size=32, head_layers=2, latent_size=8))
            self.vae = AcousticTokenizer(AcousticTokenizerConfig(
                vae_dim=8, encoder_n_filters=4, encoder_ratios=(2, 2),
                encoder_depths="1-1-1", decoder_n_filters=4))

    seed_rng(0)
    pair = Pair()

    def run(m):
        x = _rng(4).standard_normal((4, 8)).astype(np.float32)
        cond = _rng(5).standard_normal((4, 32)).astype(np.float32)
        v = m.head(jnp.asarray(x), jnp.full((4,), 10.0), jnp.asarray(cond))
        lat = _rng(6).standard_normal((1, 5, 8)).astype(np.float32)
        audio = m.vae.decode(jnp.asarray(lat))
        return {"head_v": np.asarray(v), "vae_audio": np.asarray(audio)}

    check_golden("vibevoice_head_vae", pair, run)


def test_golden_funasr_encoder():
    from test_funasr import tiny_cfg

    from mlx_audio_tpu.stt.models.funasr import Model

    seed_rng(0)
    model = Model(tiny_cfg())

    def run(m):
        x = (_rng(7).standard_normal((1, 20, 24)) * 0.1).astype(np.float32)
        enc = m.encoder(jnp.asarray(x))
        return {"enc": np.asarray(enc)}

    check_golden("funasr_encoder", model, run)


def test_golden_glmasr_encoder():
    from test_glmasr import tiny_cfg

    from mlx_audio_tpu.stt.models.glmasr import Model

    seed_rng(0)
    model = Model(tiny_cfg())

    def run(m):
        mel = (_rng(8).standard_normal((1, 3000, 16)) * 0.1
               ).astype(np.float32)
        emb = m.audio_encoder(jnp.asarray(mel))
        return {"emb": np.asarray(emb)}

    check_golden("glmasr_encoder", model, run)


def test_golden_sam_audio_dit():
    from mlx_audio_tpu.sts.models.sam_audio import DiT, TransformerConfig

    seed_rng(0)
    dit = DiT(TransformerConfig(dim=32, n_heads=4, n_layers=2,
                                context_dim=32, out_channels=16,
                                frequency_embedding_dim=16))

    def run(m):
        x = (_rng(9).standard_normal((2, 10, 32)) * 0.1).astype(np.float32)
        mem = (_rng(10).standard_normal((2, 3, 32)) * 0.1
               ).astype(np.float32)
        out = m(jnp.asarray(x), jnp.full((2,), 0.5), memory=jnp.asarray(mem))
        return {"out": np.asarray(out)}

    check_golden("sam_audio_dit", dit, run)


def test_golden_echo_tts():
    from test_echo_tts import tiny_cfg

    from mlx_audio_tpu.tts.models.echo_tts import Model

    seed_rng(0)
    model = Model(tiny_cfg())

    def run(m):
        lat = m.generate_latents("hello", rng_seed=0)
        return {"latents": np.asarray(lat)}

    check_golden("echo_tts", model, run)


def test_golden_pocket_tts_flow():
    from mlx_audio_tpu.tts.models.pocket_tts.pocket_tts import SimpleMLPAdaLN

    seed_rng(0)
    net = SimpleMLPAdaLN(in_channels=8, model_channels=24, out_channels=8,
                         cond_channels=16, num_res_blocks=2)

    def run(m):
        c = (_rng(11).standard_normal((3, 16)) * 0.1).astype(np.float32)
        s = np.full((3, 1), 0.3, np.float32)
        t = np.full((3, 1), 0.7, np.float32)
        x = (_rng(12).standard_normal((3, 8)) * 0.1).astype(np.float32)
        v = m(jnp.asarray(c), jnp.asarray(s), jnp.asarray(t), jnp.asarray(x))
        return {"v": np.asarray(v)}

    check_golden("pocket_tts_flow", net, run)


def test_golden_voxcpm_vae():
    from test_voxcpm import tiny_args

    from mlx_audio_tpu.tts.models.voxcpm import Model

    seed_rng(0)
    model = Model(tiny_args())

    def run(m):
        wav = (_rng(13).standard_normal((1, 100)) * 0.1).astype(np.float32)
        lat = m.audio_vae.encode(jnp.asarray(wav))
        out = m.audio_vae.decode(lat)
        return {"lat": np.asarray(lat), "out": np.asarray(out)}

    check_golden("voxcpm_vae", model, run)


def test_golden_indextts_conditioning():
    """IndexTTS conformer + perceiver conditioning path (pinned as the
    two submodules so the fixture skips the fixed-width bigvgan speaker
    encoder — 20 MB of weights the pin never exercises)."""
    from test_indextts import tiny_args

    from mlx_audio_tpu.nn.module import Module
    from mlx_audio_tpu.tts.models.indextts import Model

    seed_rng(0)
    model = Model(tiny_args())

    class CondPath(Module):
        def __init__(self, m):
            self.conditioning_encoder = m.conditioning_encoder
            self.perceiver_encoder = m.perceiver_encoder

    pair = CondPath(model)

    def run(m):
        mel = (_rng(14).standard_normal((1, 40, 16)) * 0.1
               ).astype(np.float32)
        cond = m.perceiver_encoder(m.conditioning_encoder(jnp.asarray(mel)))
        return {"cond": np.asarray(cond)}

    check_golden("indextts_conditioning", pair, run)


def test_golden_soprano_decoder():
    from mlx_audio_tpu.tts.models.soprano import SopranoDecoder

    seed_rng(0)
    dec = SopranoDecoder(num_input_channels=32, decoder_num_layers=1,
                         decoder_dim=32, decoder_intermediate_dim=64,
                         hop_length=64, n_fft=256, upscale=4)

    def run(m):
        h = (_rng(15).standard_normal((1, 9, 32)) * 0.1).astype(np.float32)
        audio = m(jnp.asarray(h))
        return {"audio": np.asarray(audio)}

    check_golden("soprano_decoder", dec, run)


def test_golden_smart_turn():
    from mlx_audio_tpu.vad.models.smart_turn import Model, ModelConfig

    seed_rng(0)
    cfg = ModelConfig.from_dict(dict(
        encoder_config=dict(num_mel_bins=80, max_source_positions=400,
                            d_model=64, encoder_attention_heads=4,
                            encoder_layers=1, encoder_ffn_dim=128),
        processor_config=dict(max_audio_seconds=8),
    ))
    model = Model(cfg)

    def run(m):
        audio = (_rng(16).standard_normal(16000) * 0.1).astype(np.float32)
        out = m.predict_endpoint(audio)
        return {"prob": np.asarray([out.probability], np.float32)}

    check_golden("smart_turn", model, run)


def test_golden_dacvae():
    from mlx_audio_tpu.codec.models.dacvae import DACVAE, DACVAEConfig

    seed_rng(0)
    cfg = DACVAEConfig(encoder_dim=8, encoder_rates=[2, 3], latent_dim=32,
                       decoder_dim=24, decoder_rates=[3, 2], codebook_dim=8)
    m = DACVAE(cfg)
    # the pin decodes with message=None, which skips the watermarker
    # entirely (decode_with_watermark early-return) — swap in a tiny one
    # so the fixture doesn't carry 30 MB of unexercised 512-wide LSTMs
    from mlx_audio_tpu.codec.models.dacvae.dacvae import Watermarker

    m.decoder.wm_model = Watermarker(d_out=1, d_latent=8, channels=4,
                                     hidden=8, nbits=4, lstm_layers=1)

    def run(model):
        wav = (_rng(17).standard_normal((1, 60, 1)) * 0.1
               ).astype(np.float32)
        lat = model.encode(jnp.asarray(wav))
        out = model.decode(lat)
        return {"lat": np.asarray(lat), "out": np.asarray(out)}

    check_golden("dacvae", m, run)


def test_golden_fish_s1_dac():
    from mlx_audio_tpu.codec.models.fish_s1_dac import (
        DownsampleResidualVectorQuantize, FishS1DAC,
        WindowLimitedTransformer)
    from mlx_audio_tpu.codec.models.fish_s1_dac.fish_s1_dac import ModelArgs

    seed_rng(0)
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

    def run(model):
        audio = (_rng(18).standard_normal((1, 256)) * 0.1
                 ).astype(np.float32)
        codes = model.encode(jnp.asarray(audio))
        out = model.decode(codes)
        return {"codes": np.asarray(codes), "out": np.asarray(out)}

    check_golden("fish_s1_dac", m, run)


def test_golden_lfm2_detokenizer():
    from mlx_audio_tpu.sts.models.lfm_audio import (
        DetokenizerConfig, LFM2AudioDetokenizer)

    seed_rng(0)
    det = LFM2AudioDetokenizer(DetokenizerConfig(
        hidden_size=16, num_hidden_layers=2,
        layer_types=("conv", "sliding_attention"), num_attention_heads=2,
        num_key_value_heads=1, intermediate_size=32, sliding_window=4,
        output_size=2 * (32 // 2 + 1), num_codebooks=4, vocab_size=20,
        n_fft=32, hop_length=8, upsample_factor=2))

    def run(m):
        codes = _rng(19).integers(0, 20, (1, 4, 5)).astype(np.int32)
        wav = m(jnp.asarray(codes))
        return {"wav": np.asarray(wav)}

    check_golden("lfm2_detokenizer", det, run)


def test_golden_parakeet_tdt_decoder():
    """Parakeet TDT: encoder + predict network + joint through the
    on-device greedy loop."""
    import test_parakeet as tp

    from mlx_audio_tpu.stt.models.parakeet.audio import log_mel_spectrogram
    from mlx_audio_tpu.stt.models.parakeet.parakeet import (
        ParakeetTDT, ParakeetTDTArgs, TDTDecodingArgs)
    from mlx_audio_tpu.stt.models.parakeet.rnnt import (
        JointArgs, JointNetworkArgs, PredictArgs, PredictNetworkArgs)

    seed_rng(0)
    args = ParakeetTDTArgs(
        preprocessor=tp.tiny_pre(), encoder=tp.tiny_enc(),
        decoder=PredictArgs(
            prednet=PredictNetworkArgs(pred_hidden=48, pred_rnn_layers=1),
            vocab_size=len(tp.VOCAB)),
        joint=JointArgs(
            jointnet=JointNetworkArgs(joint_hidden=48, activation="relu",
                                      pred_hidden=48, encoder_hidden=64),
            num_classes=len(tp.VOCAB), vocabulary=tp.VOCAB,
            num_extra_outputs=5),
        decoding=TDTDecodingArgs(model_type="tdt", durations=[0, 1, 2, 3, 4],
                                 greedy={"max_symbols": 3}),
    )
    model = ParakeetTDT(args)

    def run(m):
        audio = (_rng(20).standard_normal(16000) * 0.1).astype(np.float32)
        mel = log_mel_spectrogram(audio, m.preprocessor_config)
        res = m.decode(mel)[0]
        toks = [t.id for s in res.sentences for t in s.tokens]
        starts = [t.start for s in res.sentences for t in s.tokens]
        return {"tokens": np.asarray(toks, np.int32),
                "starts": np.asarray(starts, np.float32)}

    check_golden("parakeet_tdt_decoder", model, run)


def test_golden_parakeet_rnnt_decoder():
    import test_parakeet as tp

    from mlx_audio_tpu.stt.models.parakeet.audio import log_mel_spectrogram
    from mlx_audio_tpu.stt.models.parakeet.parakeet import (
        ParakeetRNNT, ParakeetRNNTArgs, RNNTDecodingArgs)
    from mlx_audio_tpu.stt.models.parakeet.rnnt import (
        JointArgs, JointNetworkArgs, PredictArgs, PredictNetworkArgs)

    seed_rng(0)
    args = ParakeetRNNTArgs(
        preprocessor=tp.tiny_pre(), encoder=tp.tiny_enc(),
        decoder=PredictArgs(
            prednet=PredictNetworkArgs(pred_hidden=48, pred_rnn_layers=1),
            vocab_size=len(tp.VOCAB)),
        joint=JointArgs(
            jointnet=JointNetworkArgs(joint_hidden=48, activation="relu",
                                      pred_hidden=48, encoder_hidden=64),
            num_classes=len(tp.VOCAB), vocabulary=tp.VOCAB,
            num_extra_outputs=0),
        decoding=RNNTDecodingArgs(greedy={"max_symbols": 3}),
    )
    model = ParakeetRNNT(args)

    def run(m):
        audio = (_rng(21).standard_normal(16000) * 0.1).astype(np.float32)
        mel = log_mel_spectrogram(audio, m.preprocessor_config)
        res = m.decode(mel)[0]
        toks = [t.id for s in res.sentences for t in s.tokens]
        return {"tokens": np.asarray(toks, np.int32)}

    check_golden("parakeet_rnnt_decoder", model, run)
