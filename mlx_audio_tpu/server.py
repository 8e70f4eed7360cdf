"""OpenAI-compatible audio server.

Contract of the reference `mlx_audio/server.py` (848 LoC): in-process
`ModelProvider` cache with a lock, `POST /v1/audio/speech` (streamed encoded
audio), `POST /v1/audio/transcriptions` (multipart upload), model CRUD under
`/v1/models`, CORS, worker count via MLX_AUDIO_NUM_WORKERS.

Two transports:
- FastAPI/uvicorn app (`create_app`) when those packages are installed —
  full parity including the realtime WebSocket endpoint.
- A dependency-free stdlib ThreadingHTTPServer fallback implementing the
  REST surface, so the server runs in hermetic environments (this is also
  what the tests exercise).
"""

from __future__ import annotations

import io
import json
import logging
import os
import re
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from . import audio_io

NUM_WORKERS = int(os.environ.get("MLX_AUDIO_NUM_WORKERS", "1"))
ALLOWED_ORIGINS = os.environ.get("MLX_AUDIO_ALLOWED_ORIGINS", "*")
BATCHING = os.environ.get("MLX_AUDIO_BATCHING", "1") != "0"


class ModelProvider:
    """Thread-safe cache of loaded models (reference server.py:74-94)."""

    def __init__(self):
        self._models: Dict[str, Any] = {}
        self._lock = threading.Lock()

    def load_model(self, model_name: str):
        with self._lock:
            if model_name not in self._models:
                from .utils import load_model

                model = load_model(model_name)
                # Per-chip request batching (BASELINE serving north star):
                # models exposing make_batcher get a scheduler so concurrent
                # requests fuse into one XLA dispatch. MLX_AUDIO_TPU_DP=N
                # additionally replicates the model over N chips with one
                # batcher per replica, round-robin (parallel/serving.py).
                if BATCHING and hasattr(model, "make_batcher"):
                    import jax as _jax

                    dp = int(os.environ.get("MLX_AUDIO_TPU_DP", "0") or 0)
                    if dp > 1 and len(_jax.devices()) >= dp:
                        from .parallel.serving import DPReplicaPool

                        batcher = DPReplicaPool(
                            model, lambda m: m.make_batcher(),
                            devices=_jax.devices()[:dp]).install()
                    else:
                        batcher = model.make_batcher().install()
                    self._maybe_warmup(model, batcher)
                self._models[model_name] = model
            return self._models[model_name]

    @staticmethod
    def _maybe_warmup(model, batcher) -> None:
        """Best-effort background pre-compile of every batch bucket /
        slot program (batcher.warmup): without it, the first request at a
        new concurrency level stalls ~30 s behind an XLA compile
        (SERVING_BENCH.md). Runs on a daemon thread so load_model returns
        immediately. Whisper batchers get the option combinations the
        transcription endpoints actually produce; every other batcher
        (Kokoro buckets, Parakeet windows, Qwen3-TTS/Sesame slot pools)
        exposes a no-arg warmup. Failures log at debug level."""
        if not hasattr(batcher, "warmup"):
            return

        def _warm():
            try:
                if hasattr(model, "dims") and hasattr(model,
                                                      "get_tokenizer"):
                    import jax.numpy as jnp

                    from .stt.models.whisper.decoding import DecodingOptions

                    tok = model.get_tokenizer()
                    window = jnp.zeros((3000, model.dims.n_mels),
                                       jnp.float32)
                    # both without_timestamps values share the encoder but
                    # compile distinct decode programs
                    for without_ts in (False, True):
                        opts = DecodingOptions(task="transcribe",
                                               language=tok.language or "en",
                                               temperature=0.0,
                                               without_timestamps=without_ts)
                        batcher.warmup(window, list(tok.sot_sequence),
                                       opts, tok)
                else:
                    batcher.warmup()
            except Exception as e:
                logging.getLogger(__name__).debug(
                    "batcher warmup skipped: %s", e)

        threading.Thread(target=_warm, daemon=True).start()

    def list_models(self) -> List[str]:
        with self._lock:
            return list(self._models)

    def unload(self, model_name: str) -> bool:
        with self._lock:
            model = self._models.pop(model_name, None)
            if model is None:
                return False
            # tear down any serving batcher installed at load time (its
            # scheduler thread and infer-hook entry hold the model alive)
            from .serving import get_infer_hook

            hook = get_infer_hook(model)
            if hook is not None and hasattr(hook, "close"):
                hook.close()
            return True


model_provider = ModelProvider()


# ---------------------------------------------------------------------------
# Core request handlers (transport-independent)
# ---------------------------------------------------------------------------


def _ui_html() -> str:
    """Built-in studio web UI (reference server.py:709-780 shells out to an
    npm dev server; here the single-file UI is served in-process at /ui)."""
    from pathlib import Path

    return (Path(__file__).parent / "ui" / "index.html").read_text()


def _wav_stream_header(sample_rate: int) -> bytes:
    """WAV header with unknown (max) data size — lets PCM frames stream
    chunk-by-chunk; players treat 0xFFFFFFFF as 'read until EOF'."""
    import struct

    byte_rate = sample_rate * 2
    fmt_chunk = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )


def generate_speech(payload: dict, provider: ModelProvider = None):
    """Yield encoded audio chunks for a TTS request (reference :256-316).

    Streaming: wav/pcm responses are emitted per generated segment (header
    first for wav), so time-to-first-byte is one segment's synthesis, not
    the whole utterance. Formats needing the full signal (mp3/flac/ogg)
    buffer and encode once at the end.
    """
    provider = provider or model_provider
    model_name = payload.get("model", "prince-canuma/Kokoro-82M")
    fmt = payload.get("response_format", "wav")
    model = provider.load_model(model_name)
    gen_kwargs = {
        k: v
        for k, v in dict(
            text=payload.get("input", payload.get("text", "")),
            voice=payload.get("voice"),
            speed=payload.get("speed", 1.0),
            lang_code=payload.get("lang_code", "a"),
            # remaining SpeechRequest fields (reference server.py:154-169),
            # filtered below against the model's generate() signature
            instruct=payload.get("instruct"),
            gender=payload.get("gender"),
            pitch=payload.get("pitch"),
            ref_audio=payload.get("ref_audio"),
            ref_text=payload.get("ref_text"),
            temperature=payload.get("temperature"),
            top_p=payload.get("top_p"),
            top_k=payload.get("top_k"),
            repetition_penalty=payload.get("repetition_penalty"),
        ).items()
        if v is not None
    }
    import inspect

    streamable = fmt in ("wav", "pcm")
    try:
        params = inspect.signature(model.generate).parameters
        # models with a real mid-utterance streaming decode (Qwen3-TTS,
        # Sesame, …) deliver audio chunk-by-chunk for streamable formats —
        # including under an installed serving batcher, whose `on_frame`
        # delivery keeps time-to-first-audio at one chunk even when the
        # request is fused with concurrent co-tenants
        if streamable and "stream" in params:
            gen_kwargs["stream"] = True
            if (payload.get("streaming_interval") is not None
                    and "streaming_interval" in params):
                gen_kwargs["streaming_interval"] = float(
                    payload["streaming_interval"])
        if not any(p.kind is inspect.Parameter.VAR_KEYWORD
                   for p in params.values()):
            gen_kwargs = {k: v for k, v in gen_kwargs.items() if k in params}
    except (TypeError, ValueError):
        pass
    sample_rate = None
    pcm = []
    sent_header = False
    for result in model.generate(**gen_kwargs):
        sample_rate = result.sample_rate
        chunk = np.asarray(result.audio).reshape(-1)
        if not streamable:
            pcm.append(chunk)
            continue
        if fmt == "wav" and not sent_header:
            yield _wav_stream_header(sample_rate)
            sent_header = True
        pcm16 = np.clip(chunk, -1.0, 1.0)
        yield (pcm16 * 32767.0).astype("<i2").tobytes()
    if streamable:
        if fmt == "wav" and not sent_header:
            yield _wav_stream_header(sample_rate or 24000)
        return
    audio = np.concatenate(pcm) if pcm else np.zeros(1, np.float32)
    yield audio_io.encode_bytes(audio, sample_rate or 24000, fmt)


def transcribe_audio(file_bytes: bytes, payload: dict,
                     provider: ModelProvider = None) -> dict:
    """Handle a transcription request (reference :364-412)."""
    provider = provider or model_provider
    model_name = payload.get("model", "mlx-community/whisper-large-v3-turbo")
    model = provider.load_model(model_name)
    x, sr = audio_io.read(file_bytes)
    if x.ndim == 2:
        x = x.mean(axis=1)
    from .utils import resample_audio

    if sr != 16000:
        x = resample_audio(x.astype(np.float32), sr, 16000)
    kwargs = {}
    if payload.get("language"):
        kwargs["language"] = payload["language"]
    # pass-through options the reference form accepts (server.py:364-392),
    # filtered against this model's generate() signature
    import inspect

    try:
        params = inspect.signature(model.generate).parameters
        accepted = set(params)
        var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                     for p in params.values())
    except (TypeError, ValueError):
        accepted, var_kw = set(), True
    # frame_threshold is an AlignAtt streaming knob (generate_streaming) —
    # not forwarded on this non-streaming path
    for opt in ("verbose", "max_tokens", "chunk_duration",
                "context", "prefill_step_size"):
        if payload.get(opt) is not None and (var_kw or opt in accepted):
            kwargs[opt] = payload[opt]
    result = model.generate(x, **kwargs)
    out = {"text": result.text}
    if payload.get("response_format") == "verbose_json":
        out["segments"] = result.segments
        out["language"] = result.language
        out["duration"] = result.duration
    return out


def transcribe_audio_stream(file_bytes: bytes, payload: dict,
                            provider: ModelProvider = None):
    """NDJSON streaming transcription (reference server.py:364-412 streams
    per-segment lines): yields one JSON line per decoded segment as the
    seek loop produces it, then a final line with the full text.

    Decoding/validation of the upload happens EAGERLY (before the first
    yield), so transport code can surface errors as a clean HTTP status
    instead of corrupting an already-started chunked body."""
    import queue as _q
    import threading as _t

    provider = provider or model_provider
    model_name = payload.get("model", "mlx-community/whisper-large-v3-turbo")
    model = provider.load_model(model_name)
    x, sr = audio_io.read(file_bytes)
    if x.ndim == 2:
        x = x.mean(axis=1)
    from .utils import resample_audio

    if sr != 16000:
        x = resample_audio(x.astype(np.float32), sr, 16000)

    return _stream_transcription(model, x, payload)


def _stream_transcription(model, x, payload):
    import queue as _q
    import threading as _t

    q: "_q.Queue" = _q.Queue()
    DONE = object()

    import inspect

    streams_segments = "on_segment" in inspect.signature(model.generate).parameters

    def run():
        try:
            kwargs = {}
            if payload.get("language"):
                kwargs["language"] = payload["language"]
            if streams_segments:
                kwargs["on_segment"] = q.put
            result = model.generate(x, **kwargs)
            if not streams_segments:
                for seg in result.segments or []:
                    q.put(seg)
            q.put({"type": "done", "text": result.text,
                   "language": getattr(result, "language", None),
                   "duration": getattr(result, "duration", None)})
        except Exception as e:
            q.put({"type": "error", "error": f"{type(e).__name__}: {e}"})
        finally:
            q.put(DONE)

    _t.Thread(target=run, daemon=True).start()
    while True:
        item = q.get()
        if item is DONE:
            break
        yield (json.dumps(item) + "\n").encode()


class EnergyGate:
    """RMS-energy speech gate — the dependency-free fallback when
    webrtcvad is not installed."""

    def __init__(self, threshold: float = 0.01, sample_rate: int = 16000):
        self.threshold = threshold
        self.sample_rate = sample_rate

    def has_speech(self, frame: np.ndarray) -> bool:
        if not len(frame):
            return False
        return float(np.sqrt((frame ** 2).mean() + 1e-12)) > self.threshold


class WebRTCGate:
    """webrtcvad speech gate matching the reference's WS endpoint
    (reference server.py:439-508): Vad(mode=3), 30 ms frames, a chunk
    counts as speech if ANY frame does, and VAD errors conservatively
    assume speech."""

    FRAME_MS = 30

    def __init__(self, sample_rate: int = 16000, mode: int = 3, vad=None):
        if vad is None:
            import webrtcvad  # gated: optional dependency

            vad = webrtcvad.Vad(mode)
        self.vad = vad
        self.sample_rate = sample_rate
        self.frame_size = int(sample_rate * self.FRAME_MS / 1000)

    def has_speech(self, frame: np.ndarray) -> bool:
        pcm16 = (np.clip(frame, -1.0, 1.0) * 32767.0).astype("<i2")
        n = len(pcm16) // self.frame_size
        for i in range(n):
            chunk = pcm16[i * self.frame_size:(i + 1) * self.frame_size]
            try:
                if self.vad.is_speech(chunk.tobytes(), self.sample_rate):
                    return True
            except (ValueError, OSError):
                return True  # conservative, like the reference
        # tail shorter than one VAD frame: fall back to energy so very
        # small chunks aren't silently dropped
        if n == 0 and len(pcm16):
            return EnergyGate(sample_rate=self.sample_rate).has_speech(frame)
        return False


def make_vad_gate(sample_rate: int = 16000, energy_threshold: float = 0.01):
    """webrtcvad when importable (the reference's gating), else the
    energy fallback."""
    try:
        return WebRTCGate(sample_rate=sample_rate)
    except ImportError:
        return EnergyGate(threshold=energy_threshold,
                          sample_rate=sample_rate)


class RealtimeSTTSession:
    """Transport-independent realtime STT state machine (reference
    server.py:415-706): 16 kHz int16 PCM frames in → partial transcripts
    every `partial_interval` s of buffered speech, finals on
    `silence_gap` s of silence or at `max_buffer` s. Speech gating uses
    webrtcvad when available, else RMS energy (`make_vad_gate`)."""

    def __init__(self, model, partial_interval: float = 1.5,
                 silence_gap: float = 0.5, max_buffer: float = 30.0,
                 energy_threshold: float = 0.01, sample_rate: int = 16000,
                 vad_gate=None):
        self.model = model
        self.partial_interval = partial_interval
        self.silence_gap = silence_gap
        self.max_buffer = max_buffer
        self.energy_threshold = energy_threshold
        self.sample_rate = sample_rate
        self.vad_gate = vad_gate or make_vad_gate(sample_rate,
                                                  energy_threshold)
        self.buffer = np.zeros(0, np.float32)
        self.silence_run = 0.0
        self.last_partial = 0.0
        self.speech_seen = False

    def _decode(self) -> str:
        result = self.model.generate(self.buffer)
        return result.text

    def feed(self, pcm16: bytes) -> List[dict]:
        """Feed raw int16 PCM; returns 0+ events {type: partial|final, text}."""
        frame = np.frombuffer(pcm16, np.int16).astype(np.float32) / 32768.0
        if self.vad_gate.has_speech(frame):
            self.silence_run = 0.0
            self.speech_seen = True
        else:
            self.silence_run += len(frame) / self.sample_rate
        self.buffer = np.concatenate([self.buffer, frame])
        buffered = len(self.buffer) / self.sample_rate

        events: List[dict] = []
        if not self.speech_seen:
            # idle microphone: don't run decodes on pure silence (avoids
            # wasted dispatches and silence hallucinations); cap the buffer
            if buffered >= self.max_buffer:
                self.buffer = self.buffer[-self.sample_rate:]
            return events
        final = (
            self.silence_run >= self.silence_gap and buffered > self.silence_gap
        ) or buffered >= self.max_buffer
        if final or buffered - self.last_partial >= self.partial_interval:
            if len(self.buffer) >= self.sample_rate // 10:
                events.append({
                    "type": "final" if final else "partial",
                    "text": self._decode(),
                })
            if final:
                self.buffer = np.zeros(0, np.float32)
                self.silence_run = 0.0
                self.last_partial = 0.0
                self.speech_seen = False
            else:
                self.last_partial = buffered
        return events

    def finalize(self) -> Optional[dict]:
        """Flush the remaining buffer as a final transcript."""
        if self.speech_seen and len(self.buffer) >= self.sample_rate // 10:
            text = self._decode()
            self.buffer = np.zeros(0, np.float32)
            return {"type": "final", "text": text}
        return None


# ---------------------------------------------------------------------------
# Stdlib HTTP transport
# ---------------------------------------------------------------------------


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser → (fields dict, files dict)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("missing multipart boundary")
    boundary = m.group(1).encode()
    fields: Dict[str, str] = {}
    files: Dict[str, bytes] = {}
    for part in body.split(b"--" + boundary):
        # strip exactly the single delimiting CRLF on each side — a blanket
        # strip would eat trailing 0x0D/0x0A bytes of binary file content
        if part.startswith(b"\r\n"):
            part = part[2:]
        if part.endswith(b"\r\n"):
            part = part[:-2]
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, content = part.split(b"\r\n\r\n", 1)
        headers = header_blob.decode(errors="replace")
        name_m = re.search(r'name="([^"]+)"', headers)
        if not name_m:
            continue
        name = name_m.group(1)
        if 'filename="' in headers:
            files[name] = content
        else:
            fields[name] = content.decode(errors="replace")
    return fields, files


class _Handler(BaseHTTPRequestHandler):
    provider: ModelProvider = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet
        pass

    def _cors_origin(self) -> str:
        """One origin per response: echo the request Origin when allowed
        (a comma-joined list is not a valid Access-Control-Allow-Origin)."""
        allowed = [o.strip() for o in ALLOWED_ORIGINS.split(",")]
        if "*" in allowed:
            return "*"
        origin = self.headers.get("Origin", "")
        return origin if origin in allowed else allowed[0]

    def _send(self, code: int, body: bytes, content_type="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", self._cors_origin())
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode())

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(length)

    def do_OPTIONS(self):
        self.send_response(204)
        self.send_header("Access-Control-Allow-Origin", self._cors_origin())
        self.send_header("Access-Control-Allow-Methods", "GET, POST, DELETE, OPTIONS")
        self.send_header("Access-Control-Allow-Headers", "*")
        self.send_header("Content-Length", "0")
        self.end_headers()

    REALTIME_WS_PATHS = (
        "/v1/audio/transcriptions/realtime",  # reference route (server.py:415)
        "/v1/audio/speech/stream",
    )

    def do_GET(self):
        ws_path = self.path.split("?")[0]
        if (
            ws_path in self.REALTIME_WS_PATHS
            and "websocket" in self.headers.get("Upgrade", "").lower()
        ):
            if ws_path == "/v1/audio/speech/stream":
                self._tts_stream_ws()
            else:
                self._realtime_ws()
        elif self.path == "/":
            self._json(200, {
                "name": "mlx_audio_tpu server",
                "endpoints": [
                    "/v1/audio/speech", "/v1/audio/transcriptions",
                    "/v1/audio/transcriptions/realtime (ws stt)",
                    "/v1/audio/speech/stream (ws tts)", "/v1/models",
                    "/ui",
                ],
            })
        elif self.path == "/health":
            self._json(200, {"status": "ok"})
        elif self.path == "/ui":
            self._send(200, _ui_html().encode(),
                       content_type="text/html; charset=utf-8")
        elif self.path == "/v1/models":
            models = self.provider.list_models()
            self._json(200, {
                "object": "list",
                "data": [
                    {"id": m, "object": "model", "created": int(time.time()),
                     "owned_by": "mlx_audio_tpu"}
                    for m in models
                ],
            })
        else:
            self._json(404, {"error": "not found"})

    def _ws_handshake(self):
        """Complete the RFC 6455 upgrade; returns a WebSocketConnection or
        None if the request is malformed."""
        from .ws import WebSocketConnection, accept_key

        key = self.headers.get("Sec-WebSocket-Key")
        if not key:
            self._json(400, {"error": "missing Sec-WebSocket-Key"})
            return None
        self.send_response(101)
        self.send_header("Upgrade", "websocket")
        self.send_header("Connection", "Upgrade")
        self.send_header("Sec-WebSocket-Accept", accept_key(key))
        self.end_headers()
        return WebSocketConnection(self.rfile, self.wfile,
                                   auto_close_reply=False)

    def _tts_stream_ws(self):
        """Streaming TTS over WebSocket: each JSON text message
        {"input": ..., "model": ..., "voice": ...} streams back
        {"type": "start", "sample_rate": N}, binary int16 PCM frames per
        generated segment, then {"type": "done", "segments": K}. Multiple
        requests may be sent over one connection."""
        from urllib.parse import parse_qs, urlparse

        from .ws import OP_CLOSE, OP_BINARY

        conn = self._ws_handshake()
        if conn is None:
            return
        q = parse_qs(urlparse(self.path).query)
        default_model = q.get("model", [None])[0]
        try:
            while True:
                msg = conn.recv()
                if msg is None:
                    break
                opcode, payload = msg
                if opcode == OP_CLOSE:
                    conn.close()
                    break
                if opcode == OP_BINARY:
                    continue  # TTS requests are JSON text frames
                try:
                    req = json.loads(payload or b"{}")
                except ValueError:
                    conn.send_text(json.dumps(
                        {"type": "error", "error": "invalid JSON"}))
                    continue
                text = req.get("input") or req.get("text")
                if not text:
                    conn.send_text(json.dumps(
                        {"type": "error", "error": "missing 'input'"}))
                    continue
                model_name = req.get("model") or default_model
                if not model_name:
                    conn.send_text(json.dumps(
                        {"type": "error", "error": "missing 'model'"}))
                    continue
                try:
                    model = self.provider.load_model(model_name)
                    kwargs = {}
                    if req.get("voice"):
                        kwargs["voice"] = req["voice"]
                    if req.get("speed"):
                        kwargs["speed"] = float(req["speed"])
                    n_seg = 0
                    started = False
                    for seg in model.generate(text, **kwargs):
                        if not started:
                            conn.send_text(json.dumps(
                                {"type": "start",
                                 "sample_rate": int(seg.sample_rate)}))
                            started = True
                        pcm = np.clip(
                            np.asarray(seg.audio, np.float32).reshape(-1),
                            -1.0, 1.0)
                        conn.send_binary(
                            (pcm * 32767.0).astype("<i2").tobytes())
                        n_seg += 1
                    conn.send_text(json.dumps(
                        {"type": "done", "segments": n_seg}))
                except Exception as e:  # surface model errors to the client
                    conn.send_text(json.dumps(
                        {"type": "error", "error": str(e)}))
        finally:
            conn.close()
        self.close_connection = True

    def _realtime_ws(self):
        """Realtime STT over stdlib WebSocket (reference server.py:415-706;
        the FastAPI transport shares RealtimeSTTSession)."""
        from urllib.parse import parse_qs, urlparse

        from .ws import OP_BINARY, OP_CLOSE

        conn = self._ws_handshake()
        if conn is None:
            return
        q = parse_qs(urlparse(self.path).query)
        model_name = q.get("model", ["mlx-community/whisper-large-v3-turbo"])[0]
        session = None

        def flush_final():
            final = session.finalize() if session is not None else None
            if final:
                try:
                    conn.send_text(json.dumps(final))
                except Exception:
                    pass

        try:
            while True:
                msg = conn.recv()
                if msg is None:
                    break
                opcode, payload = msg
                if opcode == OP_CLOSE:
                    # flush the remaining transcript BEFORE completing the
                    # close handshake (data after our Close would be lost)
                    flush_final()
                    session = None
                    conn.close()
                    break
                if opcode != OP_BINARY:
                    # JSON control message: initial config (reference
                    # protocol: config first, then {"status": "ready"}) or
                    # a finalize command; unknown commands are ignored
                    try:
                        cmd = json.loads(payload or b"{}")
                    except ValueError:
                        cmd = {}
                    if payload == b"finalize" or cmd.get("command") == "finalize":
                        if session is not None:
                            event = session.finalize()
                            if event:
                                conn.send_text(json.dumps(event))
                        continue
                    if cmd.get("command") is not None:
                        continue  # unknown command: keep the live session
                    if session is None:
                        model_name = cmd.get("model", model_name)
                        model = self.provider.load_model(model_name)
                        session = RealtimeSTTSession(model)
                        conn.send_text(json.dumps(
                            {"status": "ready",
                             "message": "Ready to transcribe"}
                        ))
                    # config while live: ignore (a new session would drop
                    # the buffered audio)
                    continue
                if session is None:
                    model = self.provider.load_model(model_name)
                    session = RealtimeSTTSession(model)
                for event in session.feed(payload):
                    conn.send_text(json.dumps(event))
        finally:
            flush_final()
            conn.close()
        self.close_connection = True

    def do_POST(self):
        try:
            if self.path == "/v1/audio/speech":
                payload = json.loads(self._read_body() or b"{}")
                chunks = b"".join(generate_speech(payload, self.provider))
                fmt = payload.get("response_format", "wav")
                self._send(200, chunks, content_type=f"audio/{fmt}")
            elif self.path == "/v1/audio/transcriptions":
                ctype = self.headers.get("Content-Type", "")
                if "multipart/form-data" not in ctype:
                    self._json(400, {"error": "expected multipart/form-data"})
                    return
                fields, files = _parse_multipart(self._read_body(), ctype)
                blob = files.get("file", b"")
                if fields.get("stream") in ("true", "1"):
                    # validate/decode BEFORE the 200 so errors surface as a
                    # clean JSON status, not a corrupted chunked body
                    stream = transcribe_audio_stream(blob, fields, self.provider)
                    # NDJSON: one line per segment as it decodes
                    self.send_response(200)
                    self.send_header("Content-Type", "application/x-ndjson")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.send_header(
                        "Access-Control-Allow-Origin", self._cors_origin()
                    )
                    self.end_headers()
                    for line in stream:
                        self.wfile.write(f"{len(line):x}\r\n".encode())
                        self.wfile.write(line + b"\r\n")
                        self.wfile.flush()
                    self.wfile.write(b"0\r\n\r\n")
                    return
                out = transcribe_audio(blob, fields, self.provider)
                self._json(200, out)
            elif self.path.split("?")[0] == "/v1/models":
                # reference server.py:219-231 passes model_name as a query
                # param; a JSON body also works
                from urllib.parse import parse_qs, urlsplit

                q = parse_qs(urlsplit(self.path).query)
                payload = json.loads(self._read_body() or b"{}")
                name = (q.get("model_name", [None])[0]
                        or payload.get("model_name") or payload.get("model"))
                if not name:
                    self._json(400, {"error": "model_name required"})
                    return
                self.provider.load_model(name)
                self._json(200, {"status": "success",
                                 "message": f"Model {name} added successfully"})
            else:
                self._json(404, {"error": "not found"})
        except FileNotFoundError as e:
            self._json(404, {"error": str(e)})
        except Exception as e:  # surface errors as JSON, keep server alive
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    def do_DELETE(self):
        from urllib.parse import parse_qs, unquote, urlsplit

        bare = self.path.split("?")[0]
        m = re.match(r"^/v1/models/(.+)$", bare)
        name = None
        query_style = False
        if m:
            name = m.group(1)
        elif bare == "/v1/models":
            # reference server.py:234-252: ?model_name= query param (204 on
            # success); a JSON body also works (JSON response, like path style)
            q = parse_qs(urlsplit(self.path).query)
            name = q.get("model_name", [None])[0]
            query_style = name is not None
            if name is None:
                try:
                    payload = json.loads(self._read_body() or b"{}")
                except ValueError:
                    payload = {}
                name = payload.get("model_name") or payload.get("model")
        if name:
            name = unquote(name).strip('"')
            if self.provider.unload(name):
                if query_style:  # reference query style returns 204 No Content
                    self._send(204, b"")
                else:  # path/body styles keep the JSON body contract
                    self._json(200, {"status": "unloaded", "model": name})
            else:
                self._json(404, {"error": f"Model '{name}' not found"})
        else:
            self._json(404, {"error": "not found"})


def serve_stdlib(host: str = "127.0.0.1", port: int = 8000,
                 provider: Optional[ModelProvider] = None) -> ThreadingHTTPServer:
    """Start the dependency-free server; returns the (running) HTTPServer."""
    handler = type("Handler", (_Handler,), {"provider": provider or model_provider})
    httpd = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd


# ---------------------------------------------------------------------------
# FastAPI transport (full parity when available)
# ---------------------------------------------------------------------------


def create_app(provider: Optional[ModelProvider] = None):
    """FastAPI app with REST + realtime WebSocket STT (requires fastapi)."""
    from fastapi import FastAPI, File, Form, UploadFile, WebSocket
    from fastapi.middleware.cors import CORSMiddleware
    from fastapi.responses import JSONResponse, StreamingResponse

    provider = provider or model_provider
    app = FastAPI(title="mlx_audio_tpu server")
    app.add_middleware(
        CORSMiddleware,
        allow_origins=[o.strip() for o in ALLOWED_ORIGINS.split(",")],
        allow_methods=["*"],
        allow_headers=["*"],
    )

    @app.get("/")
    async def root():
        # reference server.py:193-197
        return {"message": "Welcome to the MLX Audio API server! "
                           "The studio UI is served at /ui."}

    @app.get("/health")
    async def health():
        return {"status": "ok"}

    @app.get("/ui")
    async def studio_ui():
        from fastapi.responses import HTMLResponse

        return HTMLResponse(_ui_html())

    @app.post("/v1/audio/speech")
    async def speech(payload: dict):
        fmt = payload.get("response_format", "wav")
        return StreamingResponse(
            iter(generate_speech(payload, provider)), media_type=f"audio/{fmt}"
        )

    @app.post("/v1/audio/transcriptions")
    async def transcriptions(
        file: UploadFile = File(...),
        model: str = Form("mlx-community/whisper-large-v3-turbo"),
        language: Optional[str] = Form(None),
        response_format: str = Form("json"),
        stream: bool = Form(False),
        verbose: bool = Form(False),
        max_tokens: Optional[int] = Form(None),
        chunk_duration: Optional[float] = Form(None),
        frame_threshold: Optional[int] = Form(None),
        context: Optional[str] = Form(None),
        prefill_step_size: Optional[int] = Form(None),
    ):
        blob = await file.read()
        payload = {"model": model, "language": language,
                   "response_format": response_format,
                   "verbose": verbose or None, "max_tokens": max_tokens,
                   "chunk_duration": chunk_duration,
                   "frame_threshold": frame_threshold, "context": context,
                   "prefill_step_size": prefill_step_size}
        if stream:
            return StreamingResponse(
                iter(transcribe_audio_stream(blob, payload, provider)),
                media_type="application/x-ndjson",
            )
        return JSONResponse(transcribe_audio(blob, payload, provider))

    @app.get("/v1/models")
    async def list_models():
        return {
            "object": "list",
            "data": [
                {"id": m, "object": "model", "created": int(time.time()),
                 "owned_by": "mlx_audio_tpu"}
                for m in provider.list_models()
            ],
        }

    @app.post("/v1/models")
    async def load_model_ep(model_name: Optional[str] = None,
                            payload: Optional[dict] = None):
        # reference server.py:219-231 takes model_name as a query param;
        # a JSON body with model_name/model also works
        name = model_name or ((payload or {}).get("model_name")
                              or (payload or {}).get("model"))
        provider.load_model(name)
        return {"status": "success",
                "message": f"Model {name} added successfully"}

    @app.delete("/v1/models")
    async def remove_model(model_name: str):
        # reference server.py:234-252: query param, 204 on success
        from urllib.parse import unquote

        from fastapi import HTTPException, Response

        name = unquote(model_name).strip('"')
        if provider.unload(name):
            return Response(status_code=204)
        raise HTTPException(status_code=404,
                            detail=f"Model '{name}' not found")

    @app.delete("/v1/models/{model_id:path}")
    async def delete_model(model_id: str):
        ok = provider.unload(model_id)
        return JSONResponse(
            {"status": "unloaded" if ok else "error", "model": model_id},
            status_code=200 if ok else 404,
        )

    @app.websocket("/v1/audio/speech/stream")
    async def streaming_tts(ws: WebSocket):
        """Streaming TTS: JSON request frames in, binary int16 PCM segment
        frames out (same protocol as the stdlib transport's
        _tts_stream_ws)."""
        await ws.accept()
        default_model = ws.query_params.get("model")
        try:
            while True:
                msg = await ws.receive()
                if msg.get("type") == "websocket.disconnect":
                    break
                if msg.get("text") is None:
                    continue
                try:
                    req = json.loads(msg["text"])
                except ValueError:
                    await ws.send_json(
                        {"type": "error", "error": "invalid JSON"})
                    continue
                text = req.get("input") or req.get("text")
                model_name = req.get("model") or default_model
                if not text or not model_name:
                    await ws.send_json(
                        {"type": "error",
                         "error": "missing 'input' or 'model'"})
                    continue
                try:
                    import asyncio
                    import queue as _queue

                    model = await asyncio.to_thread(
                        provider.load_model, model_name)
                    kwargs = {}
                    if req.get("voice"):
                        kwargs["voice"] = req["voice"]
                    if req.get("speed"):
                        kwargs["speed"] = float(req["speed"])

                    # the blocking generate loop (device dispatches per
                    # segment, possibly minutes of audio) runs in a worker
                    # thread so this long-lived session can't starve the
                    # event loop for other connections
                    q: "_queue.Queue" = _queue.Queue(maxsize=4)

                    def produce():
                        try:
                            for seg in model.generate(text, **kwargs):
                                q.put(("seg", seg))
                            q.put(("done", None))
                        except Exception as e:  # surfaced below
                            q.put(("err", e))

                    loop = asyncio.get_running_loop()
                    producer = loop.run_in_executor(None, produce)
                    n_seg = 0
                    started = False
                    while True:
                        kind, item = await asyncio.to_thread(q.get)
                        if kind == "err":
                            raise item
                        if kind == "done":
                            break
                        if not started:
                            await ws.send_json(
                                {"type": "start",
                                 "sample_rate": int(item.sample_rate)})
                            started = True
                        pcm = np.clip(
                            np.asarray(item.audio, np.float32).reshape(-1),
                            -1.0, 1.0)
                        await ws.send_bytes(
                            (pcm * 32767.0).astype("<i2").tobytes())
                        n_seg += 1
                    await producer
                    await ws.send_json({"type": "done", "segments": n_seg})
                except Exception as e:
                    await ws.send_json({"type": "error", "error": str(e)})
        except Exception:
            pass

    @app.websocket("/v1/audio/transcriptions/realtime")
    async def realtime_stt(ws: WebSocket):
        """Realtime STT: client streams 16 kHz int16 PCM frames; server sends
        partial transcripts every ~1.5 s of buffered speech and finals on
        silence gaps (reference server.py:415-706). Shares
        RealtimeSTTSession with the stdlib WebSocket transport."""
        await ws.accept()
        model = provider.load_model(
            ws.query_params.get("model", "mlx-community/whisper-large-v3-turbo")
        )
        session = RealtimeSTTSession(model)
        try:
            while True:
                msg = await ws.receive()
                if msg.get("type") == "websocket.disconnect":
                    break
                if msg.get("bytes") is not None:
                    for event in session.feed(msg["bytes"]):
                        await ws.send_json(event)
                elif msg.get("text") is not None:
                    try:
                        cmd = json.loads(msg["text"])
                    except ValueError:
                        cmd = {}
                    if msg["text"] == "finalize" or cmd.get("command") == "finalize":
                        event = session.finalize()
                        if event:
                            await ws.send_json(event)
                    elif cmd.get("command") is None:
                        await ws.send_json(
                            {"status": "ready",
                             "message": "Ready to transcribe"}
                        )
        except Exception:
            pass
        finally:
            final = session.finalize()
            if final:
                try:
                    await ws.send_json(final)
                except Exception:
                    pass

    return app


def enable_server_compile_cache() -> Optional[str]:
    """Default-on persistent XLA compile cache for the server entrypoint.

    Cold-start compile is the dominant serving-latency tax on TPU (each
    shape bucket compiles an executable: ~48 s for the Whisper cap-224
    program, 267 s for SAM separate — BENCH_r02/SAM_BENCH). A restarted
    server re-pays all of it without this cache.

    Resolution order:
    - ``MLX_AUDIO_TPU_COMPILE_CACHE=0|off|no`` → disabled (opt-out).
    - ``MLX_AUDIO_TPU_COMPILE_CACHE=<dir>`` → enabled at <dir> (forced on,
      even on remote-compile backends).
    - unset → enabled at ``~/.cache/mlx_audio_tpu/xla`` UNLESS a
      remote-compile backend is detected (axon tunnel:
      ``PALLAS_AXON_POOL_IPS``/``JAX_PLATFORMS=axon``), where the
      persistent cache has hung in practice — there it stays off unless
      forced by an explicit path.

    Returns the cache dir (enabled) or None.
    """
    env = os.environ.get("MLX_AUDIO_TPU_COMPILE_CACHE", "").strip()
    if env.lower() in ("0", "off", "no", "false"):
        return None
    if not env:
        remote_compile_backend = (
            bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
            or os.environ.get("JAX_PLATFORMS", "") == "axon"
        )
        if remote_compile_backend:
            return None
        env = str(Path.home() / ".cache" / "mlx_audio_tpu" / "xla")
    import jax

    Path(env).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", env)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return env


def main(argv=None):
    import argparse

    cache_dir = enable_server_compile_cache()
    if cache_dir:
        print(f"persistent compile cache: {cache_dir} "
              "(disable with MLX_AUDIO_TPU_COMPILE_CACHE=off)")

    p = argparse.ArgumentParser(description="mlx_audio_tpu server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--workers", type=int, default=NUM_WORKERS)
    p.add_argument("--allowed-origins", nargs="+", default=None,
                   help="CORS origins (overrides MLX_AUDIO_ALLOWED_ORIGINS)")
    p.add_argument("--reload", action="store_true",
                   help="uvicorn auto-reload (development)")
    p.add_argument("--start-ui", action="store_true",
                   help="Print the built-in studio UI URL (served at /ui)")
    p.add_argument("--log-dir", default="logs",
                   help="Directory for server logs (reference server.py:826;"
                        " there it holds the UI subprocess log — our UI is "
                        "in-process, so server.log is written instead)")
    args = p.parse_args(argv)
    if args.log_dir:
        import logging
        from pathlib import Path as _Path

        _Path(args.log_dir).mkdir(parents=True, exist_ok=True)
        logging.getLogger().addHandler(
            logging.FileHandler(_Path(args.log_dir) / "server.log"))
    if args.allowed_origins:
        global ALLOWED_ORIGINS
        ALLOWED_ORIGINS = ",".join(args.allowed_origins)
        os.environ["MLX_AUDIO_ALLOWED_ORIGINS"] = ALLOWED_ORIGINS
    if args.start_ui:
        print(f"studio UI: http://{args.host}:{args.port}/ui")
    try:
        import uvicorn

        if args.reload or args.workers > 1:
            # uvicorn requires an import string for reload / multi-worker
            uvicorn.run("mlx_audio_tpu.server:create_app", factory=True,
                        host=args.host, port=args.port,
                        workers=args.workers, reload=args.reload)
        else:
            uvicorn.run(create_app(), host=args.host, port=args.port)
    except ImportError:
        print(f"fastapi/uvicorn not available — stdlib server on "
              f"{args.host}:{args.port}")
        httpd = serve_stdlib(args.host, args.port)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            httpd.shutdown()


if __name__ == "__main__":
    main()
