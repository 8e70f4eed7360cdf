"""Server endpoint-contract tests with a fake model provider (reference
strategy: test_server.py patches the provider)."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from mlx_audio_tpu import server as srv
from mlx_audio_tpu import audio_io
from mlx_audio_tpu.stt.models.base import STTOutput
from mlx_audio_tpu.tts.models.base import GenerationResult


class FakeTTS:
    def generate(self, text, **kwargs):
        audio = np.zeros(2400, np.float32)
        yield GenerationResult(audio=audio, samples=2400, sample_rate=24000)


class FakeSTT:
    def generate(self, audio, **kwargs):
        return STTOutput(text="hello world", segments=[], language="en",
                         duration=len(audio) / 16000)


class FakeProvider(srv.ModelProvider):
    def load_model(self, name):
        with self._lock:
            if name not in self._models:
                self._models[name] = FakeTTS() if "tts" in name.lower() or "kokoro" in name.lower() else FakeSTT()
            return self._models[name]


@pytest.fixture(scope="module")
def server_url():
    provider = FakeProvider()
    httpd = srv.serve_stdlib("127.0.0.1", 0, provider)
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


def _post_json(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.read(), dict(r.headers)


def test_health(server_url):
    with urllib.request.urlopen(server_url + "/health") as r:
        assert json.loads(r.read())["status"] == "ok"


def test_studio_ui_served(server_url):
    """Built-in web UI at /ui (reference server.py:709-780 equivalent)."""
    with urllib.request.urlopen(server_url + "/ui") as r:
        body = r.read().decode()
        assert r.headers.get_content_type() == "text/html"
    assert "mlx_audio_tpu studio" in body
    assert "/v1/audio/speech" in body  # wired to the real endpoints


def test_speech_endpoint_returns_wav(server_url):
    status, body, headers = _post_json(
        server_url + "/v1/audio/speech",
        {"model": "kokoro-test", "input": "Hello!", "voice": "af_heart"},
    )
    assert status == 200
    assert body[:4] == b"RIFF"
    assert "audio/wav" in headers["Content-Type"]


def test_transcription_endpoint_multipart(server_url):
    wav = audio_io.encode_bytes(np.zeros(16000, np.float32), 16000, "wav")
    boundary = "BOUNDARYXYZ"
    parts = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="model"\r\n\r\n'
        "whisper-test\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
    ).encode() + wav + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        server_url + "/v1/audio/transcriptions",
        data=parts,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert out["text"] == "hello world"


def test_model_crud(server_url):
    status, body, _ = _post_json(
        server_url + "/v1/models", {"model_name": "kokoro-crud"}
    )
    assert status == 200
    with urllib.request.urlopen(server_url + "/v1/models") as r:
        models = [m["id"] for m in json.loads(r.read())["data"]]
    assert "kokoro-crud" in models

    req = urllib.request.Request(
        server_url + "/v1/models/kokoro-crud", method="DELETE"
    )
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read())["status"] == "unloaded"


def test_missing_model_name_400(server_url):
    req = urllib.request.Request(
        server_url + "/v1/models", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_unknown_route_404(server_url):
    try:
        urllib.request.urlopen(server_url + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_generate_speech_streams_per_segment():
    """wav responses stream: header first, then one PCM chunk per generated
    segment (reference server.py:256-316 streams encoded chunks)."""

    class MultiSegTTS:
        def generate(self, text, **kwargs):
            for _ in range(3):
                yield GenerationResult(
                    audio=np.full(1200, 0.5, np.float32), samples=1200,
                    sample_rate=24000,
                )

    class P(srv.ModelProvider):
        def load_model(self, name):
            return MultiSegTTS()

    chunks = list(srv.generate_speech({"model": "m", "input": "x"}, P()))
    assert len(chunks) == 4  # header + 3 segments
    assert chunks[0][:4] == b"RIFF"
    joined = b"".join(chunks)
    x, sr = audio_io.read(joined)
    assert sr == 24000 and x.shape[0] == 3600
    assert np.allclose(x, 0.5, atol=1e-3)

    # pcm: raw int16 frames, no header
    chunks = list(
        srv.generate_speech({"model": "m", "input": "x", "response_format": "pcm"}, P())
    )
    assert len(chunks) == 3
    pcm = np.frombuffer(b"".join(chunks), "<i2")
    assert pcm.shape[0] == 3600


class SegmentedSTT:
    """Fake STT supporting on_segment (like Whisper's seek loop)."""

    def generate(self, audio, on_segment=None, **kw):
        segs = [
            {"id": 0, "start": 0.0, "end": 1.0, "text": "hello"},
            {"id": 1, "start": 1.0, "end": 2.0, "text": " world"},
        ]
        for s in segs:
            if on_segment:
                on_segment(s)
        return STTOutput(text="hello world", segments=segs, language="en",
                         duration=2.0)


def test_transcribe_audio_stream_ndjson():
    class P(srv.ModelProvider):
        def load_model(self, name):
            return SegmentedSTT()

    wav = audio_io.encode_bytes(np.zeros(16000, np.float32), 16000, "wav")
    lines = list(srv.transcribe_audio_stream(wav, {"model": "m"}, P()))
    objs = [json.loads(l) for l in lines]
    assert [o.get("text") for o in objs[:2]] == ["hello", " world"]
    assert objs[-1]["type"] == "done" and objs[-1]["text"] == "hello world"


def test_transcription_endpoint_streaming():
    class P(srv.ModelProvider):
        def load_model(self, name):
            return SegmentedSTT()

    httpd = srv.serve_stdlib("127.0.0.1", 0, P())
    host, port = httpd.server_address
    try:
        wav = audio_io.encode_bytes(np.zeros(16000, np.float32), 16000, "wav")
        boundary = "XBOUND"
        body = b""
        for name, val in [("model", b"m"), ("stream", b"true")]:
            body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                     f'name="{name}"\r\n\r\n').encode() + val + b"\r\n"
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="file"; filename="a.wav"\r\n\r\n').encode()
        body += wav + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/audio/transcriptions", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert "ndjson" in r.headers["Content-Type"]
            objs = [json.loads(l) for l in r.read().splitlines() if l.strip()]
        assert objs[-1]["type"] == "done"
        assert len(objs) == 3
    finally:
        httpd.shutdown()


def test_transcription_streaming_bad_audio_clean_error():
    """Corrupt upload with stream=true → clean JSON error status, not a
    corrupted chunked body."""

    class P(srv.ModelProvider):
        def load_model(self, name):
            return SegmentedSTT()

    httpd = srv.serve_stdlib("127.0.0.1", 0, P())
    host, port = httpd.server_address
    try:
        boundary = "XB"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="stream"\r\n\r\n').encode() + b"true\r\n"
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="file"; filename="a.wav"\r\n\r\n').encode()
        body += b"NOTAWAVFILE" + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/audio/transcriptions", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"},
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected an HTTP error")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_root_endpoint(server_url):
    with urllib.request.urlopen(f"{server_url}/") as r:
        body = json.loads(r.read())
    assert r.status == 200 and body


def test_model_crud_query_param_style(server_url):
    """Reference-style model CRUD: POST/DELETE /v1/models?model_name=X
    (reference server.py:219-252; DELETE returns 204)."""
    req = urllib.request.Request(
        f"{server_url}/v1/models?model_name=test-tts-q", method="POST")
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert body["status"] == "success"

    with urllib.request.urlopen(f"{server_url}/v1/models") as r:
        ids = [m["id"] for m in json.loads(r.read())["data"]]
    assert "test-tts-q" in ids

    req = urllib.request.Request(
        f"{server_url}/v1/models?model_name=test-tts-q", method="DELETE")
    with urllib.request.urlopen(req) as r:
        assert r.status == 204

    req = urllib.request.Request(
        f"{server_url}/v1/models?model_name=test-tts-q", method="DELETE")
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised


def test_server_compile_cache_policy(monkeypatch, tmp_path):
    """Default-on for local backends; off on the axon remote-compile
    tunnel unless forced by an explicit path; off on explicit opt-out
    (VERDICT r2 item 9)."""
    import jax

    from mlx_audio_tpu import server as srv

    home = tmp_path / "home"
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.delenv("MLX_AUDIO_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    prev = jax.config.jax_compilation_cache_dir
    try:
        # local backend, unset -> default-on under ~/.cache
        d = srv.enable_server_compile_cache()
        assert d and d.endswith("mlx_audio_tpu/xla")

        # axon tunnel detected -> stays off
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
        assert srv.enable_server_compile_cache() is None

        # ...unless forced with an explicit path
        forced = tmp_path / "forced"
        monkeypatch.setenv("MLX_AUDIO_TPU_COMPILE_CACHE", str(forced))
        assert srv.enable_server_compile_cache() == str(forced)
        assert forced.is_dir()

        # explicit opt-out wins
        monkeypatch.setenv("MLX_AUDIO_TPU_COMPILE_CACHE", "off")
        assert srv.enable_server_compile_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
