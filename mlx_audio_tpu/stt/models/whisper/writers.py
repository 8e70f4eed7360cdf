"""Transcript writers: txt / srt / vtt / tsv / json
(contract of reference stt/models/whisper/writers.py:249)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

__all__ = ["get_writer", "format_timestamp"]


def format_timestamp(seconds: float, always_include_hours: bool = False,
                     decimal_marker: str = ".") -> str:
    assert seconds >= 0
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return f"{hours_marker}{minutes:02d}:{secs:02d}{decimal_marker}{ms:03d}"


class ResultWriter:
    extension: str = "txt"

    def __init__(self, output_dir: str):
        self.output_dir = Path(output_dir)

    def __call__(self, result, audio_path: str, **kwargs):
        self.output_dir.mkdir(parents=True, exist_ok=True)
        out = self.output_dir / (Path(audio_path).stem + "." + self.extension)
        with open(out, "w", encoding="utf-8") as f:
            self.write_result(result, f, **kwargs)
        return out

    def write_result(self, result, file, **kwargs):
        raise NotImplementedError


class WriteTXT(ResultWriter):
    extension = "txt"

    def write_result(self, result, file, **kwargs):
        for segment in result.segments or [{"text": result.text}]:
            print(segment["text"].strip(), file=file, flush=True)


class WriteVTT(ResultWriter):
    extension = "vtt"

    def write_result(self, result, file, **kwargs):
        print("WEBVTT\n", file=file)
        for seg in result.segments or []:
            print(
                f"{format_timestamp(seg['start'])} --> {format_timestamp(seg['end'])}\n"
                f"{seg['text'].strip().replace('-->', '->')}\n",
                file=file,
                flush=True,
            )


class WriteSRT(ResultWriter):
    extension = "srt"

    def write_result(self, result, file, **kwargs):
        for i, seg in enumerate(result.segments or [], start=1):
            print(
                f"{i}\n"
                f"{format_timestamp(seg['start'], True, ',')} --> "
                f"{format_timestamp(seg['end'], True, ',')}\n"
                f"{seg['text'].strip().replace('-->', '->')}\n",
                file=file,
                flush=True,
            )


class WriteTSV(ResultWriter):
    extension = "tsv"

    def write_result(self, result, file, **kwargs):
        print("start", "end", "text", sep="\t", file=file)
        for seg in result.segments or []:
            print(
                round(1000 * seg["start"]), round(1000 * seg["end"]),
                seg["text"].strip().replace("\t", " "), sep="\t", file=file,
            )


class WriteJSON(ResultWriter):
    extension = "json"

    def write_result(self, result, file, **kwargs):
        json.dump(
            {
                "text": result.text,
                "segments": result.segments,
                "language": result.language,
            },
            file,
            ensure_ascii=False,
            indent=2,
        )


def get_writer(output_format: str, output_dir: str):
    writers = {
        "txt": WriteTXT, "vtt": WriteVTT, "srt": WriteSRT,
        "tsv": WriteTSV, "json": WriteJSON,
    }
    if output_format == "all":
        all_writers = [w(output_dir) for w in writers.values()]

        def write_all(result, audio_path, **kwargs):
            for w in all_writers:
                w(result, audio_path, **kwargs)

        return write_all
    return writers[output_format](output_dir)
