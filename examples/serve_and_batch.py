#!/usr/bin/env python
"""Start the server and demonstrate per-chip request batching: N concurrent
TTS requests fuse into single XLA dispatches (see serving.BatchScheduler)."""

import json
import sys
import threading
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    from mlx_audio_tpu import server as srv

    httpd = srv.serve_stdlib("127.0.0.1", 0)
    host, port = httpd.server_address
    print(f"server on http://{host}:{port}")

    texts = [
        "Hello from stream one.",
        "A second concurrent request.",
        "And a third, all batched per chip.",
    ]

    def speak(i, text):
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/audio/speech",
            data=json.dumps({"input": text, "voice": "af_heart"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        body = urllib.request.urlopen(req, timeout=600).read()
        Path(f"out_{i}.wav").write_bytes(body)
        print(f"request {i}: {len(body)} bytes -> out_{i}.wav")

    threads = [
        threading.Thread(target=speak, args=(i, t))
        for i, t in enumerate(texts)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    httpd.shutdown()


if __name__ == "__main__":
    main()
