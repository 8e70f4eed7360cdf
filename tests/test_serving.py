"""Request-batching scheduler tests (BASELINE serving north star: batch
concurrent TTS/STT streams per chip). CPU-run: verifies grouping, window
behavior, and that the batched Kokoro path matches sequential synthesis."""

import threading
import time

import numpy as np
import pytest

from mlx_audio_tpu.serving import BatchScheduler, KokoroBatcher, get_infer_hook


def test_scheduler_groups_concurrent_submits():
    calls = []

    def batch_fn(items):
        calls.append(list(items))
        return [x * 2 for x in items]

    sched = BatchScheduler(batch_fn, max_batch=8, window_ms=100.0)
    futs = [sched.submit(i) for i in range(5)]
    results = [f.result(timeout=5) for f in futs]
    sched.close()
    assert results == [0, 2, 4, 6, 8]
    # all five arrived within the window → one batched call
    assert len(calls) == 1 and len(calls[0]) == 5
    assert sched.dispatch_count == 1


def test_scheduler_respects_bucket_keys():
    calls = []

    def batch_fn(items):
        calls.append(list(items))
        return items

    sched = BatchScheduler(
        batch_fn, bucket_fn=lambda x: x % 2, max_batch=8, window_ms=100.0
    )
    futs = [sched.submit(i) for i in range(4)]
    [f.result(timeout=5) for f in futs]
    sched.close()
    # two groups (even/odd), each batched together
    assert sorted(len(c) for c in calls) == [2, 2]


def test_scheduler_max_batch_splits():
    def batch_fn(items):
        return items

    sched = BatchScheduler(batch_fn, max_batch=2, window_ms=50.0)
    futs = [sched.submit(i) for i in range(5)]
    [f.result(timeout=5) for f in futs]
    sched.close()
    assert sched.dispatch_count >= 3  # ceil(5/2)


def test_scheduler_propagates_errors():
    def batch_fn(items):
        raise ValueError("boom")

    sched = BatchScheduler(batch_fn, window_ms=10.0)
    fut = sched.submit(1)
    with pytest.raises(ValueError):
        fut.result(timeout=5)
    sched.close()


# ---------------------------------------------------------------------------
# Batched Kokoro path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kokoro_tiny():
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig
    import mlx_audio_tpu.tts.models.kokoro.kokoro as kokoro_mod

    vocab = {c: i + 1 for i, c in enumerate(
        "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðˈˌO ,."
    )}
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
        vocab=vocab,
    )
    kokoro_mod.FRAME_BUCKETS = (64, 128, 256)
    return Model(cfg)


def test_batch_synthesize_matches_sequential(kokoro_tiny):
    rng = np.random.default_rng(0)
    texts = ["həlˈO wɜɹld", "ðə kwɪk bɹˈOn fɑks", "tˈɛst"]
    refs = [rng.standard_normal(64).astype(np.float32) * 0.1 for _ in texts]

    seq = [kokoro_tiny(t, r, return_output=True) for t, r in zip(texts, refs)]
    batched = kokoro_tiny.batch_synthesize(texts, refs)

    assert len(batched) == 3
    for s, b in zip(seq, batched):
        assert np.array_equal(s.pred_dur, b.pred_dur)
        n = min(len(s.audio), len(b.audio))
        assert len(s.audio) == len(b.audio)
        # per-row RNG + masked norms/LSTM carries → batching is inaudible;
        # only conv bleed at the valid/pad boundary differs across buckets
        corr = np.corrcoef(s.audio[:n], b.audio[:n])[0, 1]
        assert corr > 0.999, corr


def test_kokoro_batcher_fuses_concurrent_requests(kokoro_tiny):
    batcher = KokoroBatcher(kokoro_tiny, max_batch=4, window_ms=200.0).install()
    try:
        assert get_infer_hook(kokoro_tiny) is batcher
        rng = np.random.default_rng(1)
        texts = ["həlˈO wɜɹld", "ðə kwɪk fɑks", "tˈɛst ˈO"]
        refs = [rng.standard_normal(64).astype(np.float32) * 0.1 for _ in texts]

        results = [None] * 3
        def run(i):
            results[i] = batcher(texts[i], refs[i])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads: t.start()
        for t in threads: t.join(timeout=120)

        assert all(r is not None for r in results)
        for r in results:
            assert np.isfinite(r.audio).all() and len(r.audio) > 0
        # all three share the smallest text bucket → one fused dispatch
        assert batcher.dispatch_count == 1
    finally:
        batcher.close()
    assert get_infer_hook(kokoro_tiny) is None


# ---------------------------------------------------------------------------
# Batched Whisper STT path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def whisper_tiny():
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
    from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=2000, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    return Model(dims), DummyTokenizer(n_vocab=2000)


def test_whisper_batcher_matches_sequential(whisper_tiny):
    from mlx_audio_tpu.serving import WhisperBatcher, get_infer_hook

    model, tok = whisper_tiny
    rng = np.random.default_rng(0)
    audios = [
        (rng.standard_normal(16000 * 2) * 0.05).astype(np.float32)
        for _ in range(3)
    ]
    kw = dict(language="en", temperature=0.0, tokenizer=tok,
              condition_on_previous_text=False)

    seq = [model.generate(a, **kw) for a in audios]

    batcher = WhisperBatcher(model, max_batch=4, window_ms=300.0).install()
    try:
        results = [None] * 3

        def run(i):
            results[i] = model.generate(audios[i], **kw)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert all(r is not None for r in results)
        for s, b in zip(seq, results):
            assert s.text == b.text
            assert len(s.segments) == len(b.segments)
        # one 30s window per request, same prompt/options → one fused decode
        assert batcher.dispatch_count == 1
    finally:
        batcher.close()
    assert get_infer_hook(model) is None


def test_server_warms_batcher_buckets():
    """ModelProvider kicks off a background bucket warmup when the
    installed batcher supports it (SERVING_BENCH.md: an unwarmed bucket
    stalls live traffic behind a ~30 s compile)."""
    import threading
    import time as _time

    from mlx_audio_tpu.server import ModelProvider

    calls = []
    done = threading.Event()

    class FakeTok:
        language = "en"
        sot_sequence = (1, 2, 3)

    class FakeBatcher:
        def warmup(self, window, prompt, opts, tok):
            calls.append((tuple(window.shape), tuple(prompt),
                          opts.temperature, opts.without_timestamps))
            if len(calls) == 2:
                done.set()

    class FakeModel:
        class dims:
            n_mels = 128

        def get_tokenizer(self):
            return FakeTok()

    ModelProvider._maybe_warmup(FakeModel(), FakeBatcher())
    assert done.wait(timeout=30)
    # both without_timestamps variants get warmed — they compile distinct
    # decode programs the transcription endpoints can hit
    assert calls == [((3000, 128), (1, 2, 3), 0.0, False),
                     ((3000, 128), (1, 2, 3), 0.0, True)]

    # batcher without warmup: no-op, no crash
    ModelProvider._maybe_warmup(FakeModel(), object())


def test_kokoro_batcher_noarg_warmup(kokoro_tiny):
    """KokoroBatcher.warmup() pre-compiles the batch buckets without any
    request-supplied inputs (server-boot path)."""
    batcher = kokoro_tiny.make_batcher(max_batch=2, window_ms=5.0)
    try:
        batcher.warmup()
    finally:
        batcher.close()


def test_parakeet_batcher_noarg_warmup():
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import test_parakeet as tp

    from mlx_audio_tpu.stt.models.parakeet.parakeet import (
        ParakeetTDT, ParakeetTDTArgs, TDTDecodingArgs)
    from mlx_audio_tpu.stt.models.parakeet.rnnt import (
        JointArgs, JointNetworkArgs, PredictArgs, PredictNetworkArgs)

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
        decoding=TDTDecodingArgs(model_type="tdt",
                                 durations=[0, 1, 2, 3, 4],
                                 greedy={"max_symbols": 3}),
    )
    tdt = ParakeetTDT(args)
    batcher = tdt.make_batcher(max_batch=2, window_ms=5.0)
    try:
        batcher.warmup()
    finally:
        batcher.close()
