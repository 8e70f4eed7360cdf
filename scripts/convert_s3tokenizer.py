#!/usr/bin/env python
"""Convert S3Tokenizer v1/v2/v3 ONNX checkpoints to safetensors.

Behavioral spec: reference ``codec/models/s3tokenizer/scripts/convert_v2.py``
and ``convert_v3.py`` — download the FunAudioLLM ONNX speech tokenizer,
recover torch-style parameter names, run them through the model's
``sanitize()``, and save ``model.safetensors`` (+ model card) suitable for
``S3TokenizerV{N}.from_pretrained``.

Name recovery prefers the ``s3tokenizer`` pip package's ``onnx2torch``
helper when present (exact torch names); otherwise falls back to raw ONNX
initializer names, which ``sanitize()`` filters/remaps on a best-effort
basis. Both ``onnx`` and ``huggingface_hub`` are gated imports — the
script degrades with a clear message when they're missing.

Usage:
    python scripts/convert_s3tokenizer.py --version 3 --output-dir out/
    python scripts/convert_s3tokenizer.py --version 2 \
        --upload-repo my-org/S3TokenizerV2
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

# (HF repo holding the ONNX file, filename, repo model ctor name)
SOURCES = {
    1: ("FunAudioLLM/CosyVoice-300M", "speech_tokenizer_v1.onnx",
        "speech_tokenizer_v1_25hz"),
    2: ("FunAudioLLM/CosyVoice2-0.5B", "speech_tokenizer_v2.onnx",
        "speech_tokenizer_v2_25hz"),
    3: ("FunAudioLLM/Fun-CosyVoice3-0.5B-2512", "speech_tokenizer_v3.onnx",
        "speech_tokenizer_v3"),
}


def fetch_onnx(version: int, cache_dir=None) -> Path:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        sys.exit("huggingface_hub is required to download the ONNX source")
    repo_id, filename, _ = SOURCES[version]
    print(f"downloading {repo_id}/{filename} ...")
    return Path(hf_hub_download(repo_id=repo_id, filename=filename,
                                cache_dir=cache_dir))


def onnx_to_numpy(path: Path) -> dict:
    """ONNX graph → {name: np.ndarray}, torch-named when possible."""
    try:
        import torch
        from s3tokenizer.utils import onnx2torch

        state = onnx2torch(str(path), None, False)
        return {k: (v.cpu().numpy() if isinstance(v, torch.Tensor)
                    else np.asarray(v)) for k, v in state.items()}
    except ImportError:
        pass
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        sys.exit("neither `s3tokenizer` nor `onnx` is installed — "
                 "one of them is required to read the checkpoint")
    print("warning: `s3tokenizer` not installed; raw ONNX initializer "
          "names may not all map onto model parameters")
    graph = onnx.load(str(path)).graph
    return {init.name: numpy_helper.to_array(init)
            for init in graph.initializer}


def build_model(version: int):
    from mlx_audio_tpu.codec.models.s3tokenizer import (
        S3Tokenizer, S3TokenizerV2, S3TokenizerV3)

    cls = {1: S3Tokenizer, 2: S3TokenizerV2, 3: S3TokenizerV3}[version]
    return cls(SOURCES[version][2])


def write_card(output_dir: Path, version: int, upload_repo: str):
    from mlx_audio_tpu.version import __version__

    repo_id, _, _ = SOURCES[version]
    (output_dir / "README.md").write_text(
        "---\n"
        "library_name: mlx-audio-tpu\n"
        f"base_model:\n- {repo_id}\n"
        "tags:\n- speech-tokenizer\n"
        "---\n\n"
        f"# {upload_repo or f'S3TokenizerV{version}'}\n\n"
        f"S3Tokenizer v{version} (supervised semantic speech tokenizer) "
        f"converted from [{repo_id}](https://huggingface.co/{repo_id}) "
        f"ONNX weights with mlx-audio-tpu {__version__}.\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--version", type=int, choices=(1, 2, 3), default=3)
    ap.add_argument("--output-dir", type=Path, default=None)
    ap.add_argument("--cache-dir", type=Path, default=None)
    ap.add_argument("--upload-repo", default=None)
    ap.add_argument("--dry-run", action="store_true",
                    help="convert + save but skip the hub upload")
    args = ap.parse_args()

    out = args.output_dir or Path(f"s3tokenizer_v{args.version}_converted")
    out.mkdir(parents=True, exist_ok=True)

    onnx_path = fetch_onnx(args.version, args.cache_dir)
    raw = onnx_to_numpy(onnx_path)
    model = build_model(args.version)
    weights = model.sanitize({k: np.asarray(v) for k, v in raw.items()})
    weights = {k: (np.asarray(v).astype(np.float32)
                   if np.asarray(v).dtype == np.float64 else np.asarray(v))
               for k, v in weights.items()}

    from safetensors.numpy import save_file

    save_file(weights, out / "model.safetensors")
    (out / "config.json").write_text(json.dumps(
        {"model_type": "s3tokenizer", "version": args.version,
         "name": SOURCES[args.version][2]}, indent=2))
    write_card(out, args.version, args.upload_repo)
    print(f"saved {len(weights)} tensors to {out}/model.safetensors")

    if args.upload_repo and not args.dry_run:
        from mlx_audio_tpu.utils import upload_to_hub

        upload_to_hub(str(out), args.upload_repo)


if __name__ == "__main__":
    main()
