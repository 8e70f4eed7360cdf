"""AudioPlayer buffering + VoicePipeline loop tests."""

import numpy as np

from mlx_audio_tpu.tts.audio_player import AudioPlayer
from mlx_audio_tpu.sts.voice_pipeline import PipelineConfig, VoicePipeline
from mlx_audio_tpu.stt.models.base import STTOutput
from mlx_audio_tpu.tts.models.base import GenerationResult


def test_audio_player_buffering():
    p = AudioPlayer(sample_rate=1000)
    p.queue_audio(np.ones(500, np.float32))
    p.queue_audio(np.ones(250, np.float32))
    assert p._buffered_seconds() == 0.75
    out = p.flush()
    assert len(out) == 750
    assert p.wait_for_drain(0.1)


def test_voice_pipeline_end_to_end():
    class STT:
        def generate(self, audio, **kw):
            return STTOutput(text="turn on the lights")

    class TTS:
        def generate(self, text, **kw):
            yield GenerationResult(audio=np.zeros(800, np.float32), samples=800,
                                   sample_rate=16000)

    got = {}
    pipe = VoicePipeline(
        stt_model=STT(),
        llm_generate=lambda text, hist: f"Okay: {text}",
        tts_model=TTS(),
        config=PipelineConfig(silence_end_sec=0.3),
        on_user_text=lambda t: got.setdefault("user", t),
        on_assistant_text=lambda t: got.setdefault("assistant", t),
        on_audio=lambda a, sr: got.setdefault("audio", (len(a), sr)),
    )
    sr = 16000
    speech = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.2
    silence = np.zeros(sr, np.float32)
    replies = pipe.run_on_audio(np.concatenate([speech, silence]))
    assert replies == ["Okay: turn on the lights"]
    assert got["user"] == "turn on the lights"
    assert got["audio"] == (800, 16000)
    # history keeps the conversation
    assert pipe.history[-1]["role"] == "assistant"


def test_voice_pipeline_barge_in():
    """User speech during synthesis cancels the in-flight TTS
    (reference voice_pipeline.py:47-55 current_tts_cancel)."""
    import threading
    import time

    started = threading.Event()
    release = threading.Event()
    emitted = []

    class STT:
        def generate(self, audio, **kw):
            return STTOutput(text="hello")

    class SlowTTS:
        def generate(self, text, **kw):
            for i in range(10):
                started.set()
                release.wait(2.0)
                yield GenerationResult(audio=np.zeros(160, np.float32),
                                       samples=160, sample_rate=16000)

    pipe = VoicePipeline(
        stt_model=STT(), llm_generate=lambda t, h: "a long reply",
        tts_model=SlowTTS(), config=PipelineConfig(silence_end_sec=0.3),
        on_audio=lambda a, sr: emitted.append(len(a)),
    )
    sr = 16000
    speech = np.random.default_rng(1).standard_normal(sr).astype(np.float32) * 0.2
    pipe.process_chunk(np.concatenate([speech, np.zeros(sr, np.float32)]))
    assert started.wait(2.0)
    assert pipe.is_speaking
    # user starts talking again mid-response → cancel
    pipe.cancel_speech()
    release.set()
    pipe.wait_for_speech(timeout=2.0)
    assert not pipe.is_speaking
    assert len(emitted) <= 1  # at most the segment already in flight
