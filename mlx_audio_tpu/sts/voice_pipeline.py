"""Voice assistant pipeline: audio → VAD gate → STT → LLM → TTS → speaker.

Contract of reference sts/voice_pipeline.py:22-327 (asyncio mic loop with
queues and a device lock). This implementation is component-pluggable so it
runs without microphone/sounddevice: feed PCM chunks via `process_chunk` /
`run_on_audio`, or use `run()` for the live mic loop when sounddevice is
installed. VAD is energy-gated when webrtcvad is absent.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np


@dataclass
class PipelineConfig:
    sample_rate: int = 16000
    frame_ms: int = 30
    silence_end_sec: float = 0.6
    max_utterance_sec: float = 15.0
    energy_threshold: float = 0.01
    system_prompt: str = "You are a helpful voice assistant. Keep replies short."


class VoicePipeline:
    """STT → LLM → TTS loop over streamed PCM."""

    def __init__(
        self,
        stt_model=None,
        llm_generate: Optional[Callable[[str, List[dict]], str]] = None,
        tts_model=None,
        llm_model: Optional[str] = None,
        config: Optional[PipelineConfig] = None,
        on_user_text: Optional[Callable[[str], None]] = None,
        on_assistant_text: Optional[Callable[[str], None]] = None,
        on_audio: Optional[Callable[[np.ndarray, int], None]] = None,
    ):
        self.cfg = config or PipelineConfig()
        # reference-style convenience (voice_pipeline.py:22-55 takes model
        # NAMES): strings load through the domain registries
        if isinstance(stt_model, str):
            from ..stt.utils import load_model as _load_stt

            stt_model = _load_stt(stt_model)
        if isinstance(tts_model, str):
            from ..tts.utils import load_model as _load_tts

            tts_model = _load_tts(tts_model)
        if llm_generate is None and llm_model is not None:
            llm_generate = self._build_llm(llm_model)
        self.stt = stt_model
        self.llm_generate = llm_generate or (lambda text, history: text)
        self.tts = tts_model
        self.on_user_text = on_user_text or (lambda t: None)
        self.on_assistant_text = on_assistant_text or (lambda t: None)
        self.on_audio = on_audio or (lambda a, sr: None)
        self.history: List[dict] = [
            {"role": "system", "content": self.cfg.system_prompt}
        ]
        self._buffer = np.zeros(0, np.float32)
        self._silence = 0.0
        self._lock = threading.Lock()  # serialize device work (reference :53)
        self._vad = self._make_vad()
        # barge-in: speaking runs in a worker thread; new user speech sets
        # the cancel event and playback stops between TTS segments
        # (reference :47-55 current_tts_cancel / current_tts_task)
        self._tts_cancel = threading.Event()
        self._tts_thread: Optional[threading.Thread] = None

    @staticmethod
    def _build_llm(llm_model: str) -> Callable[[str, List[dict]], str]:
        """Chat callable from an LLM checkpoint name/path (reference
        voice_pipeline.py:199-232 drives mlx-lm; here the in-repo LM core)."""
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from ..lm import generate_tokens
        from ..lm.transformer import CausalLM, LMConfig
        from ..nn.module import load_weights
        from ..utils import get_model_path, load_config, load_weight_files

        path = get_model_path(llm_model)
        lm = CausalLM(LMConfig.from_dict(load_config(path)))
        lm = load_weights(lm, load_weight_files(path), strict=False).eval()
        tok = AutoTokenizer.from_pretrained(path)

        def llm_generate(text: str, history: List[dict]) -> str:
            prompt = tok.apply_chat_template(
                history, add_generation_prompt=True, tokenize=True)
            toks, n = generate_tokens(
                lm, jnp.asarray([prompt], jnp.int32), max_tokens=256,
                eos_token_ids=(tok.eos_token_id,))
            return tok.decode(
                [int(t) for t in toks[0][:n] if t != tok.eos_token_id],
                skip_special_tokens=True).strip()

        return llm_generate

    def _make_vad(self):
        try:
            import webrtcvad

            vad = webrtcvad.Vad(2)

            def is_speech(frame: np.ndarray) -> bool:
                pcm16 = np.clip(frame * 32768, -32768, 32767).astype(np.int16)
                return vad.is_speech(pcm16.tobytes(), self.cfg.sample_rate)

            return is_speech
        except ImportError:
            thr = self.cfg.energy_threshold

            def is_speech(frame: np.ndarray) -> bool:
                return float(np.sqrt((frame**2).mean() + 1e-12)) > thr

            return is_speech

    # ---- streaming entry points ----

    def process_chunk(self, chunk: np.ndarray) -> Optional[str]:
        """Feed a PCM chunk; returns the assistant reply when an utterance
        completes, else None."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        frame_len = self.cfg.sample_rate * self.cfg.frame_ms // 1000
        reply = None
        for start in range(0, len(chunk), frame_len):
            frame = chunk[start : start + frame_len]
            if len(frame) < frame_len:
                frame = np.pad(frame, (0, frame_len - len(frame)))
            speech = self._vad(frame)
            if speech and self.is_speaking:
                self.cancel_speech()  # barge-in
            if speech or len(self._buffer):
                self._buffer = np.concatenate([self._buffer, frame])
            self._silence = 0.0 if speech else self._silence + self.cfg.frame_ms / 1000
            buffered_sec = len(self._buffer) / self.cfg.sample_rate
            utterance_done = len(self._buffer) > 0 and (
                self._silence >= self.cfg.silence_end_sec
                or buffered_sec >= self.cfg.max_utterance_sec
            )
            if utterance_done:
                reply = self._handle_utterance(self._buffer)
                self._buffer = np.zeros(0, np.float32)
                self._silence = 0.0
        return reply

    def flush(self) -> Optional[str]:
        if len(self._buffer) < self.cfg.sample_rate * 0.2:
            return None
        reply = self._handle_utterance(self._buffer)
        self._buffer = np.zeros(0, np.float32)
        return reply

    def run_on_audio(self, audio: np.ndarray) -> List[str]:
        """Offline convenience: run the full loop over an array (waits for
        speech synthesis to finish before returning)."""
        replies = []
        r = self.process_chunk(audio)
        if r:
            replies.append(r)
        r = self.flush()
        if r:
            replies.append(r)
        self.wait_for_speech()
        return replies

    # ---- internals ----

    @property
    def is_speaking(self) -> bool:
        return self._tts_thread is not None and self._tts_thread.is_alive()

    def cancel_speech(self) -> None:
        """Stop the in-flight TTS response (barge-in, reference :47-55)."""
        if self.is_speaking:
            self._tts_cancel.set()

    def wait_for_speech(self, timeout: Optional[float] = None) -> None:
        if self._tts_thread is not None:
            self._tts_thread.join(timeout)

    def _speak(self, reply: str) -> None:
        def worker():
            with self._lock:  # device work serialized (reference mlx_lock)
                for result in self.tts.generate(reply):
                    if self._tts_cancel.is_set():
                        break
                    self.on_audio(np.asarray(result.audio),
                                  result.sample_rate)

        self.cancel_speech()
        self.wait_for_speech()
        self._tts_cancel = threading.Event()
        self._tts_thread = threading.Thread(target=worker, daemon=True)
        self._tts_thread.start()

    def _handle_utterance(self, audio: np.ndarray) -> Optional[str]:
        with self._lock:
            text = self.stt.generate(audio).text.strip() if self.stt else ""
            if not text:
                return None
            self.on_user_text(text)
            self.history.append({"role": "user", "content": text})
            reply = self.llm_generate(text, self.history)
            self.history.append({"role": "assistant", "content": reply})
            self.on_assistant_text(reply)
        if self.tts is not None:
            self._speak(reply)
        return reply

    def run(self):
        """Live microphone loop (requires sounddevice)."""
        import sounddevice as sd

        frame_len = self.cfg.sample_rate * self.cfg.frame_ms // 1000
        with sd.InputStream(samplerate=self.cfg.sample_rate, channels=1,
                            dtype="float32", blocksize=frame_len) as stream:
            print("listening… (ctrl-c to stop)")
            while True:
                frame, _ = stream.read(frame_len)
                self.process_chunk(frame[:, 0])
