#!/usr/bin/env python
"""Transcribe an audio file with MedASR (LASR-CTC) — TPU-native port of the
reference example (examples/medasr_transcribe.py)."""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser(description="Transcribe audio with MedASR")
    p.add_argument("audio_file", help="Path to the audio file to transcribe")
    p.add_argument("--model", default="mlx-community/medasr",
                   help="HF repo or local path of the MedASR checkpoint")
    args = p.parse_args()

    from mlx_audio_tpu.stt.utils import load_model
    from mlx_audio_tpu.utils import load_audio

    model = load_model(args.model)
    audio = load_audio(args.audio_file, sample_rate=16000)

    t0 = time.perf_counter()
    result = model.generate(audio)
    wall = time.perf_counter() - t0

    print(result.text)
    if result.duration:
        print(f"--- {result.duration:.1f}s audio in {wall:.2f}s "
              f"({result.duration / max(wall, 1e-9):.1f}x realtime)")


if __name__ == "__main__":
    main()
