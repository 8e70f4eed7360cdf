"""Minimal WebSocket client for the streaming-TTS endpoint.

Connects to a running `mlx_audio_tpu.server`, sends one synthesis request,
and writes the streamed PCM16 segments to a WAV file as they arrive.

Usage:
    python -m mlx_audio_tpu.server --port 8000   # in another terminal
    python examples/ws_tts_client.py --model <tts checkpoint> \
        --text "Hello from the TPU." --output out.wav
"""

import argparse
import json
import socket
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--voice", default=None)
    ap.add_argument("--output", default="out.wav")
    args = ap.parse_args()

    import numpy as np

    from mlx_audio_tpu import audio_io
    from mlx_audio_tpu import ws as wsmod

    sock = socket.create_connection((args.host, args.port), timeout=300)
    req, _ = wsmod.client_handshake_headers(
        f"{args.host}:{args.port}", "/v1/audio/speech/stream")
    sock.sendall(req)
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    assert b"101" in resp.split(b"\r\n", 1)[0], "websocket upgrade failed"

    conn = wsmod.WebSocketConnection(
        sock.makefile("rb"), sock.makefile("wb"), mask_outgoing=True)
    payload = {"model": args.model, "input": args.text}
    if args.voice:
        payload["voice"] = args.voice
    conn.send_text(json.dumps(payload))

    sample_rate = 24000
    pcm = b""
    while True:
        op, data = conn.recv()
        if op == wsmod.OP_TEXT:
            event = json.loads(data)
            if event["type"] == "start":
                sample_rate = event["sample_rate"]
            elif event["type"] == "done":
                print(f"done: {event['segments']} segments")
                break
            elif event["type"] == "error":
                raise SystemExit(f"server error: {event['error']}")
        elif op == wsmod.OP_BINARY:
            pcm += data
            print(f"…{len(pcm) // 2} samples", end="\r", flush=True)

    audio = np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0
    audio_io.write(args.output, audio, sample_rate)
    print(f"wrote {args.output} ({len(audio) / sample_rate:.1f}s "
          f"@ {sample_rate} Hz)")


if __name__ == "__main__":
    main()
