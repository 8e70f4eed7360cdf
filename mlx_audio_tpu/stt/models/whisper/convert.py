"""Convert an original OpenAI Whisper checkpoint (.pt with {dims,
model_state_dict}) to a native checkpoint dir (config.json + safetensors).

Behavioral spec: reference stt/models/whisper/scripts/convert.py. HF-layout
checkpoints don't need this — `Model.sanitize` maps them at load; this
script covers the openai release format whose dims live inside the pickle.

    python -m mlx_audio_tpu.stt.models.whisper.convert \
        --torch-ckpt large-v3-turbo.pt --output-dir ./whisper-large-v3-turbo
"""

from __future__ import annotations

import argparse
from pathlib import Path


def convert(torch_ckpt: str, output_dir: str, dtype: str = "float32") -> Path:
    import numpy as np
    import torch

    from ....convert import save_model

    state = torch.load(torch_ckpt, map_location="cpu", weights_only=True)
    if not isinstance(state, dict) or "dims" not in state:
        raise ValueError(
            f"{torch_ckpt}: not an OpenAI whisper checkpoint "
            "(expected {'dims', 'model_state_dict'})")
    dims = dict(state["dims"])
    dims["model_type"] = "whisper"
    weights = {}
    if dtype == "bfloat16":
        import ml_dtypes

        cast = ml_dtypes.bfloat16
    else:
        cast = {"float16": np.float16, "float32": np.float32}[dtype]
    for k, v in state["model_state_dict"].items():
        arr = v.detach().cpu().numpy()
        if arr.dtype.kind == "f":
            arr = arr.astype(cast)
        weights[k] = arr
    out = Path(output_dir)
    save_model(out, weights, dims)
    print(f"✓ converted {torch_ckpt} → {out} ({len(weights)} tensors)")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert OpenAI whisper .pt → native checkpoint")
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dtype", default="float32",
                   choices=["float16", "bfloat16", "float32"])
    args = p.parse_args(argv)
    convert(args.torch_ckpt, args.output_dir, args.dtype)


if __name__ == "__main__":
    main()
