"""WebSocket layer + realtime STT session tests (dependency-free RFC 6455
transport so realtime transcription works without fastapi/uvicorn)."""

import io
import json
import socket
import struct

import numpy as np

from mlx_audio_tpu import server as srv
from mlx_audio_tpu import ws as wsmod
from mlx_audio_tpu.stt.models.base import STTOutput


class _Loopback:
    """Pair of in-memory file objects wiring two WebSocketConnections."""

    def __init__(self):
        self.a_to_b = io.BytesIO()
        self.b_to_a = io.BytesIO()


def _pair():
    # client writes into buf1, server reads buf1; server writes buf2
    buf_c2s, buf_s2c = io.BytesIO(), io.BytesIO()
    client = wsmod.WebSocketConnection(buf_s2c, buf_c2s, mask_outgoing=True)
    server = wsmod.WebSocketConnection(buf_c2s, buf_s2c)
    return client, server, buf_c2s, buf_s2c


def test_accept_key_rfc_example():
    # RFC 6455 §1.3 sample handshake
    assert (
        wsmod.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def test_frame_roundtrip_masked_and_fragsizes():
    client, server, c2s, _ = _pair()
    client.send_text("hello")
    client.send_binary(b"\x00" * 200)       # 126..65535 length path
    client.send_binary(b"\x01" * 70000)     # 64-bit length path
    c2s.seek(0)
    op, payload = server.recv()
    assert op == wsmod.OP_TEXT and payload == b"hello"
    op, payload = server.recv()
    assert op == wsmod.OP_BINARY and len(payload) == 200
    op, payload = server.recv()
    assert op == wsmod.OP_BINARY and len(payload) == 70000


def test_ping_answered_and_close():
    client, server, c2s, s2c = _pair()
    client._send_frame(wsmod.OP_PING, b"hi")
    client.send_text("after-ping")
    c2s.seek(0)
    op, payload = server.recv()
    assert op == wsmod.OP_TEXT and payload == b"after-ping"
    # server answered the ping with a pong before the text reply
    s2c.seek(0)
    fin_op = s2c.read(2)
    assert fin_op[0] & 0x0F == wsmod.OP_PONG


class SlowSTT:
    def __init__(self):
        self.calls = 0

    def generate(self, audio, **kw):
        self.calls += 1
        return STTOutput(text=f"t{self.calls}:{len(audio)}", segments=[],
                         language="en", duration=len(audio) / 16000)


def _pcm(seconds, amp, sr=16000):
    x = (np.random.default_rng(0).standard_normal(int(sr * seconds)) * amp)
    return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()


def test_realtime_session_partials_and_finals():
    stt = SlowSTT()
    s = srv.RealtimeSTTSession(stt, partial_interval=1.0, silence_gap=0.5)
    events = []
    # 2 s of speech in 0.25 s frames → partials at ~1 s cadence
    for _ in range(8):
        events += s.feed(_pcm(0.25, 0.2))
    assert any(e["type"] == "partial" for e in events)
    assert not any(e["type"] == "final" for e in events)
    # 0.75 s of silence → final fires, buffer resets
    events2 = []
    for _ in range(3):
        events2 += s.feed(_pcm(0.25, 0.0))
    assert any(e["type"] == "final" for e in events2)
    # buffer was reset at the final; only frames after it remain
    assert len(s.buffer) <= 2 * 4000


def test_realtime_session_finalize_flushes():
    stt = SlowSTT()
    s = srv.RealtimeSTTSession(stt)
    s.feed(_pcm(0.5, 0.2))
    out = s.finalize()
    assert out and out["type"] == "final"
    assert s.finalize() is None  # empty buffer → nothing


def test_stdlib_websocket_realtime_stt_end_to_end():
    """Full socket-level WS session against the stdlib server."""

    class P(srv.ModelProvider):
        def load_model(self, name):
            return SlowSTT()

    httpd = srv.serve_stdlib("127.0.0.1", 0, P())
    host, port = httpd.server_address
    try:
        sock = socket.create_connection((host, port), timeout=10)
        req, expect_accept = wsmod.client_handshake_headers(
            f"{host}:{port}", "/v1/audio/transcriptions/realtime?model=test"
        )
        sock.sendall(req)
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += sock.recv(4096)
        head = resp.split(b"\r\n\r\n")[0].decode()
        assert "101" in head.splitlines()[0]
        assert expect_accept in head

        rfile = sock.makefile("rb")
        wfile = sock.makefile("wb")
        conn = wsmod.WebSocketConnection(rfile, wfile, mask_outgoing=True)
        # 2 s speech → at least one partial
        conn.send_binary(_pcm(2.0, 0.2))
        op, payload = conn.recv()
        event = json.loads(payload)
        assert event["type"] == "partial" and event["text"].startswith("t")
        # silence gap → final
        conn.send_binary(_pcm(1.0, 0.0))
        op, payload = conn.recv()
        assert json.loads(payload)["type"] == "final"
        conn.close()
        sock.close()
    finally:
        httpd.shutdown()


def test_reference_ws_route_with_config_handshake():
    """The reference route /v1/audio/transcriptions/realtime with the
    config-first protocol: JSON config → {"status": "ready"} → frames."""

    class P(srv.ModelProvider):
        def load_model(self, name):
            return SlowSTT()

    httpd = srv.serve_stdlib("127.0.0.1", 0, P())
    host, port = httpd.server_address
    try:
        sock = socket.create_connection((host, port), timeout=10)
        req, _ = wsmod.client_handshake_headers(
            f"{host}:{port}", "/v1/audio/transcriptions/realtime"
        )
        sock.sendall(req)
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += sock.recv(4096)
        assert b"101" in resp.split(b"\r\n")[0]

        conn = wsmod.WebSocketConnection(
            sock.makefile("rb"), sock.makefile("wb"), mask_outgoing=True
        )
        conn.send_text(json.dumps({"model": "test-model"}))
        op, payload = conn.recv()
        assert json.loads(payload)["status"] == "ready"
        conn.send_binary(_pcm(2.0, 0.2))
        op, payload = conn.recv()
        assert json.loads(payload)["type"] == "partial"
        conn.send_text(json.dumps({"command": "finalize"}))
        op, payload = conn.recv()
        assert json.loads(payload)["type"] == "final"
        conn.close()
        sock.close()
    finally:
        httpd.shutdown()


def test_delete_model_body_style():
    class P(srv.ModelProvider):
        pass

    p = P()
    p._models["m1"] = object()
    httpd = srv.serve_stdlib("127.0.0.1", 0, p)
    host, port = httpd.server_address
    try:
        import urllib.request

        req = urllib.request.Request(
            f"http://{host}:{port}/v1/models",
            data=json.dumps({"model_name": "m1"}).encode(),
            headers={"Content-Type": "application/json"}, method="DELETE",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["status"] == "unloaded"
    finally:
        httpd.shutdown()


def test_realtime_session_ignores_pure_silence():
    """Idle mic: no decodes, no finals until speech has been seen."""
    stt = SlowSTT()
    s = srv.RealtimeSTTSession(stt, partial_interval=0.5, silence_gap=0.5)
    events = []
    for _ in range(20):
        events += s.feed(_pcm(0.25, 0.0))
    assert events == []
    assert stt.calls == 0
    # speech arrives → decoding resumes
    events = []
    for _ in range(5):
        events += s.feed(_pcm(0.25, 0.2))
    assert any(e["type"] == "partial" for e in events)


def test_ws_close_flushes_final_before_close_handshake():
    """Client closes without 'finalize': the remaining transcript arrives
    BEFORE the server's Close frame (RFC 6455 forbids data after Close)."""

    class P(srv.ModelProvider):
        def load_model(self, name):
            return SlowSTT()

    httpd = srv.serve_stdlib("127.0.0.1", 0, P())
    host, port = httpd.server_address
    try:
        sock = socket.create_connection((host, port), timeout=10)
        req, _ = wsmod.client_handshake_headers(
            f"{host}:{port}", "/v1/audio/transcriptions/realtime?model=m"
        )
        sock.sendall(req)
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += sock.recv(4096)

        conn = wsmod.WebSocketConnection(
            sock.makefile("rb"), sock.makefile("wb"), mask_outgoing=True,
            auto_close_reply=False,
        )
        # short speech burst (below the partial cadence), then Close
        conn.send_binary(_pcm(0.5, 0.2))
        conn.close()
        # first message must be the flushed final TEXT, then the Close echo
        op, payload = conn.recv()
        assert op == wsmod.OP_TEXT
        assert json.loads(payload)["type"] == "final"
        nxt = conn.recv()
        assert nxt is None or nxt[0] == wsmod.OP_CLOSE
        sock.close()
    finally:
        httpd.shutdown()


def test_stdlib_websocket_streaming_tts():
    """/v1/audio/speech/stream is a TTS stream: JSON request in, start
    event + binary int16 PCM segment frames + done event out."""
    from mlx_audio_tpu.tts.models.base import GenerationResult

    class TwoSegTTS:
        def generate(self, text, **kw):
            for i in range(2):
                yield GenerationResult(
                    audio=np.full(2400, 0.25, np.float32), samples=2400,
                    sample_rate=24000, segment_idx=i)

    class P(srv.ModelProvider):
        def load_model(self, name):
            return TwoSegTTS()

    httpd = srv.serve_stdlib("127.0.0.1", 0, P())
    host, port = httpd.server_address
    try:
        sock = socket.create_connection((host, port), timeout=10)
        req, _ = wsmod.client_handshake_headers(
            f"{host}:{port}", "/v1/audio/speech/stream"
        )
        sock.sendall(req)
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += sock.recv(4096)

        conn = wsmod.WebSocketConnection(
            sock.makefile("rb"), sock.makefile("wb"), mask_outgoing=True)
        conn.send_text(json.dumps({"model": "k", "input": "hello"}))
        op, payload = conn.recv()
        start = json.loads(payload)
        assert op == wsmod.OP_TEXT
        assert start["type"] == "start" and start["sample_rate"] == 24000
        pcm = b""
        while True:
            op, payload = conn.recv()
            if op == wsmod.OP_TEXT:
                done = json.loads(payload)
                break
            assert op == wsmod.OP_BINARY
            pcm += payload
        assert done["type"] == "done" and done["segments"] == 2
        x = np.frombuffer(pcm, "<i2")
        assert len(x) == 4800 and abs(x[0] / 32767.0 - 0.25) < 1e-3
        # errors are reported, connection stays usable
        conn.send_text(json.dumps({"model": "k"}))
        op, payload = conn.recv()
        assert json.loads(payload)["type"] == "error"
        sock.close()
    finally:
        httpd.shutdown()


def test_webrtc_gate_frames_and_conservative_errors():
    """WebRTCGate matches the reference's gating (server.py:439-508):
    30 ms frames, any-speech-frame wins, VAD errors assume speech."""

    class FakeVad:
        def __init__(self):
            self.calls = []

        def is_speech(self, chunk, sr):
            self.calls.append((len(chunk), sr))
            if sr != 16000:
                raise ValueError("bad rate")
            # detect "speech" if mean |pcm| is large
            x = np.frombuffer(chunk, "<i2")
            return float(np.abs(x).mean()) > 1000

    vad = FakeVad()
    gate = srv.WebRTCGate(sample_rate=16000, vad=vad)
    assert gate.frame_size == 480  # 30 ms @ 16 kHz

    loud = np.full(960, 0.5, np.float32)   # 2 frames of speech
    quiet = np.zeros(960, np.float32)
    assert gate.has_speech(loud) is True
    assert gate.has_speech(quiet) is False
    # exact 30 ms framing: 960 samples → 2 calls of 480*2 bytes each
    assert all(nbytes == 960 and sr == 16000 for nbytes, sr in vad.calls)

    # VAD error → conservative assume-speech (reference behavior)
    err_gate = srv.WebRTCGate(sample_rate=8000, vad=FakeVad())
    assert err_gate.has_speech(np.zeros(8000, np.float32)) is True

    # sub-frame tail falls back to energy gating
    assert gate.has_speech(np.full(100, 0.5, np.float32)) is True
    assert gate.has_speech(np.zeros(100, np.float32)) is False


def test_realtime_session_with_webrtc_gate():
    """The session behaves identically with a webrtcvad-style gate."""

    class FakeVad:
        def is_speech(self, chunk, sr):
            x = np.frombuffer(chunk, "<i2")
            return float(np.abs(x).mean()) > 1000

    gate = srv.WebRTCGate(sample_rate=16000, vad=FakeVad())
    s = srv.RealtimeSTTSession(SlowSTT(), partial_interval=1.0,
                               silence_gap=0.5, vad_gate=gate)
    events = []
    for _ in range(8):
        events += s.feed(_pcm(0.25, 0.5))
    assert any(e["type"] == "partial" for e in events)
    events2 = []
    for _ in range(3):
        events2 += s.feed(_pcm(0.25, 0.0))
    assert any(e["type"] == "final" for e in events2)


def test_make_vad_gate_fallback(monkeypatch):
    """Without webrtcvad installed the factory returns the energy gate;
    with it (faked), the WebRTC gate."""
    import builtins
    import sys
    import types

    real_import = builtins.__import__

    def no_webrtc(name, *a, **k):
        if name == "webrtcvad":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_webrtc)
    assert isinstance(srv.make_vad_gate(), srv.EnergyGate)
    monkeypatch.setattr(builtins, "__import__", real_import)

    fake = types.ModuleType("webrtcvad")

    class Vad:
        def __init__(self, mode):
            self.mode = mode

        def is_speech(self, chunk, sr):
            return False

    fake.Vad = Vad
    monkeypatch.setitem(sys.modules, "webrtcvad", fake)
    gate = srv.make_vad_gate()
    assert isinstance(gate, srv.WebRTCGate)
    assert gate.vad.mode == 3  # reference uses most-aggressive mode
