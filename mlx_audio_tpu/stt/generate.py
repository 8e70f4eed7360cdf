"""STT CLI — audio → transcript files
(contract of reference stt/generate.py:250-391).

`python -m mlx_audio_tpu.stt.generate --model <path> --audio clip.wav`
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
from typing import Optional

from .utils import load_model


def generate_transcription(
    model_path: str = "mlx-community/whisper-large-v3-turbo",
    audio: str = "",
    output_path: Optional[str] = None,
    format: str = "txt",
    model=None,
    verbose: bool = True,
    **kwargs,
):
    if model is None:
        model = load_model(model_path)
    tic = time.perf_counter()
    result = model.generate(audio, **kwargs)
    wall = time.perf_counter() - tic
    if verbose:
        print(result.text)
        if result.duration:
            from ..profiling import peak_memory_gb

            print(
                f"--- {result.duration:.1f}s audio in {wall:.2f}s "
                f"({result.duration / max(wall, 1e-9):.1f}x realtime), "
                f"{result.generation_tokens} tokens, "
                f"peak memory {peak_memory_gb():.3f} GB"
            )
    if output_path is not None:
        from .models.whisper.writers import get_writer

        writer = get_writer(format, output_path)
        out = writer(result, audio)
        if verbose:
            print(f"✓ wrote {out}")
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Transcribe audio to text")
    p.add_argument("--model", default="mlx-community/whisper-large-v3-turbo")
    p.add_argument("--audio", required=True)
    p.add_argument("--output-path", default=None)
    p.add_argument("--format", default="txt",
                   choices=["txt", "srt", "vtt", "tsv", "json", "all"])
    p.add_argument("--language", default=None)
    p.add_argument("--task", default="transcribe", choices=["transcribe", "translate"])
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--word-timestamps", action="store_true")
    p.add_argument("--verbose", action="store_true", default=True)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    kwargs = {}
    if args.language:
        kwargs["language"] = args.language
    if args.temperature is not None:
        kwargs["temperature"] = args.temperature
    if args.word_timestamps:
        kwargs["word_timestamps"] = True
    generate_transcription(
        model_path=args.model,
        audio=args.audio,
        output_path=args.output_path,
        format=args.format,
        task=args.task,
        verbose=args.verbose,
        **kwargs,
    )


if __name__ == "__main__":
    main()
