"""Convert original Chatterbox release weights (ve.safetensors,
t3_cfg.safetensors, s3gen.safetensors + tokenizer.json) into one combined
native checkpoint with component prefixes (ve./t3./s3gen.).

Behavioral spec: reference tts/models/chatterbox/scripts/convert.py
(convert_all :220-408) — each component's own ``sanitize`` does the layout
work so conversion and runtime loading cannot drift; the S3Tokenizer stays
in its own repo and its ``tokenizer.*`` keys are dropped here.

    python -m mlx_audio_tpu.tts.models.chatterbox.convert \
        --source ResembleAI/chatterbox --output-dir ./chatterbox-native \
        [--quantize --q-bits 4 --q-group-size 64]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path
from typing import Optional

COMPONENT_FILES = (
    ("ve", "ve.safetensors"),
    ("t3", "t3_cfg.safetensors"),
    ("s3gen", "s3gen.safetensors"),
)


def convert(source: str, output_dir: str, quantize: bool = False,
            bits: int = 4, group_size: int = 64,
            upload_repo: Optional[str] = None,
            model_config: Optional[dict] = None) -> Path:
    from ....convert import quantize_weights, save_model
    from ....utils import get_model_path, load_weight_files
    from .chatterbox import Model, ModelConfig

    src = get_model_path(source, allow_patterns=[
        "*.safetensors", "*.json", "*.pt"])
    model = Model(ModelConfig.from_dict(model_config or {}))

    weights = {}
    for prefix, fname in COMPONENT_FILES:
        f = Path(src) / fname
        if not f.exists():
            raise FileNotFoundError(f"{source}: missing {fname}")
        w = load_weight_files(f)
        if prefix == "s3gen":  # S3Tokenizer ships separately
            w = {k: v for k, v in w.items() if not k.startswith("tokenizer.")}
        weights.update({f"{prefix}.{k}": v for k, v in w.items()})

    weights = model.sanitize(weights)

    config = {"model_type": "chatterbox", "version": "1.0"}
    if model_config:
        # the tensors were shaped under this config — persist it so
        # load_model reconstructs the same architecture
        config.update(model_config)
    if quantize:
        # T3's Llama backbone carries the bulk of the parameters; keep
        # conditioning/vocoder float (reference convert.py:121-153)
        weights = quantize_weights(
            weights, bits, group_size,
            predicate=lambda k, w: k.startswith("t3.tfmr."))
        config["quantization"] = {
            "bits": bits, "group_size": group_size,
            "quantized_components": ["t3.tfmr"],
        }

    out = Path(output_dir)
    save_model(out, weights, config)
    tok = Path(src) / "tokenizer.json"
    if tok.exists():
        shutil.copy(tok, out / "tokenizer.json")
    conds = Path(src) / "conds.pt"
    if conds.exists():
        shutil.copy(conds, out / "conds.pt")
    print(f"✓ converted {source} → {out} ({len(weights)} tensors)")

    if upload_repo:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(upload_repo, exist_ok=True)
        api.upload_folder(folder_path=str(out), repo_id=upload_repo)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert original Chatterbox weights → native checkpoint")
    p.add_argument("--source", default="ResembleAI/chatterbox",
                   help="HF repo or local dir with ve/t3_cfg/s3gen safetensors")
    p.add_argument("--output-dir", required=True)
    p.add_argument("-q", "--quantize", action="store_true")
    p.add_argument("--q-bits", type=int, default=4, choices=[2, 3, 4, 6, 8])
    p.add_argument("--q-group-size", type=int, default=64)
    p.add_argument("--upload", default=None)
    args = p.parse_args(argv)
    convert(args.source, args.output_dir, args.quantize, args.q_bits,
            args.q_group_size, args.upload)


if __name__ == "__main__":
    main()
