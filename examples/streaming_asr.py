"""Stream a transcription while long audio is being decoded.

Qwen3-ASR's `stream_transcribe` yields partial text as the on-device
block-wise decode progresses (chunk timing included), ending each audio
chunk with a final `StreamingResult` carrying token counts.

Usage:
    python examples/streaming_asr.py --model <qwen3-asr checkpoint> \
        --audio input.wav
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--language", default="English")
    ap.add_argument("--chunk-duration", type=float, default=1200.0,
                    help="split long audio at low-energy points near this")
    args = ap.parse_args()

    from mlx_audio_tpu.stt.utils import load_model
    from mlx_audio_tpu.utils import load_audio

    model = load_model(args.model)
    audio = load_audio(args.audio, sample_rate=model.sample_rate)

    for r in model.stream_transcribe(
            audio, language=args.language,
            chunk_duration=args.chunk_duration):
        if r.is_final:
            print(f"\n[done: {r.generation_tokens} tokens, "
                  f"{r.end_time:.1f}s audio]")
        else:
            print(r.text, end="", flush=True)


if __name__ == "__main__":
    main()
