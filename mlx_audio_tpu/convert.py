"""Model conversion CLI — quantize / dequantize / dtype-cast checkpoints.

Contract of the reference `mlx_audio/convert.py` (710 LoC): domain detection
heuristics (path patterns / model_type / config-key overlap), dtype cast,
4/6/8-bit quantization with group size and mixed recipes, dequantization,
model-card generation, optional HF upload. Quantization uses the same
affine packed-uint32 scheme as the runtime's QuantizedLinear, so converted
checkpoints load directly via `apply_quantization`.

Usage:
    python -m mlx_audio_tpu.convert --model <hf-or-path> -q --q-bits 4
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .nn.quantized import SUPPORTED_BITS, dequantize_arrays, quantize_arrays
from .utils import get_model_path, load_config, load_weight_files

MAX_FILE_SIZE_GB = 5

# Mixed-precision recipes: predicate(path) → bits override
QUANT_RECIPES = {
    "mixed_2_6": lambda p: 6 if ("lm_head" in p or "embed" in p) else 2,
    "mixed_3_4": lambda p: 4 if ("lm_head" in p or "embed" in p) else 3,
    "mixed_3_6": lambda p: 6 if ("lm_head" in p or "embed" in p) else 3,
    "mixed_4_6": lambda p: 6 if ("lm_head" in p or "embed" in p) else 4,
}

_TTS_TYPES = {
    "kokoro", "qwen3_tts", "sesame", "csm", "dia", "spark", "chatterbox",
    "chatterbox_turbo", "cosyvoice2", "cosyvoice3", "vibevoice", "outetts",
    "bark", "soprano", "indextts", "voxcpm", "pocket_tts", "echo_tts",
    "orpheus", "llama", "qwen3",
}
_STT_TYPES = {
    "whisper", "parakeet", "voxtral", "qwen3_asr", "funasr", "glmasr",
    "lasr", "wav2vec2",
}
_VAD_TYPES = {"sortformer", "smart_turn"}


def detect_model_domain(model_path: Path, config: dict) -> str:
    """tts/stt/vad/codec detection (reference convert.py:288-355)."""
    mt = (config.get("model_type") or "").lower().replace("-", "_")
    if mt in _TTS_TYPES:
        return "tts"
    if mt in _STT_TYPES:
        return "stt"
    if mt in _VAD_TYPES:
        return "vad"
    path_str = str(model_path).lower()
    for dom, keys in (
        ("tts", ("tts", "speech-synthesis", "kokoro", "voice")),
        ("stt", ("stt", "asr", "whisper", "transcri")),
        ("vad", ("vad", "diariz", "sortformer")),
        ("codec", ("codec", "snac", "encodec", "dac", "mimi", "vocos")),
    ):
        if any(k in path_str for k in keys):
            return dom
    # Config-key overlap heuristic (Jaccard over characteristic keys)
    keysets = {
        "stt": {"n_audio_ctx", "n_text_ctx", "encoder_layers", "decoder_layers"},
        "tts": {"istftnet", "vocab", "style_dim", "n_token", "audio_num_codebooks"},
        "codec": {"codebook_size", "upsampling_ratios", "encoder_rates"},
    }
    best, best_score = "tts", 0.0
    cfg_keys = set(config)
    for dom, ks in keysets.items():
        inter = len(cfg_keys & ks)
        union = len(cfg_keys | ks) or 1
        score = inter / union
        if inter and score > best_score:
            best, best_score = dom, score
    return best


def _should_quantize(key: str, w: np.ndarray, group_size: int) -> bool:
    if not key.endswith(".weight") or w.ndim != 2:
        return False
    if w.shape[-1] % group_size != 0:
        return False
    # skip tiny layers and norm-like params
    return w.shape[0] >= 8 and w.shape[1] >= group_size


def quantize_weights(weights: Dict[str, np.ndarray], bits: int = 4,
                     group_size: int = 64, recipe: Optional[str] = None,
                     predicate=None) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, w in weights.items():
        w = np.asarray(w)
        b = QUANT_RECIPES[recipe](k) if recipe else bits
        if b not in SUPPORTED_BITS:
            raise ValueError(f"unsupported bits={b} (supported: {SUPPORTED_BITS})")
        if (predicate is None or predicate(k, w)) and _should_quantize(k, w, group_size):
            base = k[: -len(".weight")]
            packed, scales, biases = quantize_arrays(
                w.astype(np.float32), group_size, b
            )
            out[k] = packed
            out[base + ".scales"] = scales
            out[base + ".biases"] = biases
        else:
            out[k] = w
    return out


def dequantize_weights(weights: Dict[str, np.ndarray], bits: int,
                       group_size: int,
                       overrides: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """`overrides` is the config quantization block: per-module-path dicts
    ({"bits": b, "group_size": g}) take precedence over the defaults
    (mixed-recipe checkpoints)."""
    import jax.numpy as jnp

    out = dict(weights)
    for k in [k for k in weights if k.endswith(".scales")]:
        base = k[: -len(".scales")]
        wkey = base + ".weight"
        if wkey not in weights:
            continue
        b, g = bits, group_size
        ov = (overrides or {}).get(base)
        if isinstance(ov, dict):
            b = ov.get("bits", b)
            g = ov.get("group_size", g)
        deq = dequantize_arrays(
            jnp.asarray(weights[wkey]), jnp.asarray(weights[k]),
            jnp.asarray(weights[base + ".biases"]), g, b,
        )
        out[wkey] = np.asarray(deq, np.float32)
        out.pop(k)
        out.pop(base + ".biases", None)
    return out


def save_model(out_dir: Path, weights: Dict[str, np.ndarray], config: dict):
    """Write sharded safetensors + config.json (≤5 GB per shard)."""
    from safetensors.numpy import save_file

    out_dir.mkdir(parents=True, exist_ok=True)
    max_bytes = MAX_FILE_SIZE_GB * 1024**3
    shards, cur, cur_size = [], {}, 0
    for k, w in weights.items():
        w = np.asarray(w)
        if cur_size + w.nbytes > max_bytes and cur:
            shards.append(cur)
            cur, cur_size = {}, 0
        cur[k] = w
        cur_size += w.nbytes
    shards.append(cur)

    if len(shards) == 1:
        save_file(shards[0], str(out_dir / "model.safetensors"))
    else:
        index = {"weight_map": {}, "metadata": {"total_shards": len(shards)}}
        for i, shard in enumerate(shards, 1):
            name = f"model-{i:05d}-of-{len(shards):05d}.safetensors"
            save_file(shard, str(out_dir / name))
            for k in shard:
                index["weight_map"][k] = name
        (out_dir / "model.safetensors.index.json").write_text(json.dumps(index))
    (out_dir / "config.json").write_text(json.dumps(config, indent=2))


def generate_readme(out_dir: Path, src: str, config: dict):
    mt = config.get("model_type", "audio")
    quant = config.get("quantization")
    body = (
        f"# {Path(src).name} (mlx_audio_tpu)\n\n"
        f"Converted from `{src}` with `mlx_audio_tpu.convert`.\n\n"
        f"- model_type: `{mt}`\n"
        + (f"- quantization: {quant['bits']}-bit, group size "
           f"{quant['group_size']}\n" if quant else "")
        + "\n```bash\npython -m mlx_audio_tpu.tts.generate --model "
        f"{out_dir.name} --text 'Hello.'\n```\n"
    )
    (out_dir / "README.md").write_text(body)


def convert(
    model: str,
    output_path: Optional[str] = None,
    quantize: bool = False,
    q_bits: int = 4,
    q_group_size: int = 64,
    q_recipe: Optional[str] = None,
    dequantize: bool = False,
    dtype: Optional[str] = None,
    upload_repo: Optional[str] = None,
    revision: Optional[str] = None,
    model_domain: Optional[str] = None,
) -> Path:
    src_path = get_model_path(model, revision=revision)
    config = load_config(src_path)
    weights = load_weight_files(src_path)
    domain = model_domain or detect_model_domain(src_path, config)

    if dtype:
        tgt = {"float16": np.float16, "bfloat16": np.float32,  # bf16 via ml_dtypes
               "float32": np.float32}[dtype]
        if dtype == "bfloat16":
            import ml_dtypes

            tgt = ml_dtypes.bfloat16
        weights = {
            k: (np.asarray(w).astype(tgt) if np.asarray(w).dtype.kind == "f" else w)
            for k, w in weights.items()
        }

    if dequantize and "quantization" in config:
        q = config.pop("quantization")
        weights = dequantize_weights(weights, q["bits"], q["group_size"],
                                     overrides=q)
    elif quantize:
        original_keys = set(weights)
        recipe = q_recipe if isinstance(q_recipe, str) else None
        predicate = q_recipe if callable(q_recipe) else None
        weights = quantize_weights(weights, q_bits, q_group_size, recipe,
                                   predicate=predicate)
        config["quantization"] = {"bits": q_bits, "group_size": q_group_size}
        if recipe:
            config["quantization"]["recipe"] = recipe
            # per-path overrides so the loader unpacks mixed bit-widths
            fn = QUANT_RECIPES[recipe]
            for k in original_keys:
                if k.endswith(".weight") and k[:-len(".weight")] + ".scales" in weights:
                    b = fn(k)
                    if b != q_bits:
                        config["quantization"][k[: -len(".weight")]] = {
                            "bits": b, "group_size": q_group_size,
                        }

    out = Path(
        output_path
        or f"{Path(model).name}-{'%d-bit' % q_bits if quantize else dtype or 'converted'}"
    )
    save_model(out, weights, config)
    generate_readme(out, model, config)
    # copy aux files (tokenizer, voices, …)
    for f in Path(src_path).iterdir():
        if f.suffix in (".json", ".txt", ".model", ".tiktoken") and f.name != "config.json":
            shutil.copy(f, out / f.name)
        if f.is_dir() and f.name == "voices":
            shutil.copytree(f, out / "voices", dirs_exist_ok=True)

    if upload_repo:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(upload_repo, exist_ok=True)
        api.upload_folder(folder_path=str(out), repo_id=upload_repo)
    print(f"✓ converted ({domain}) → {out}")
    return out


def main(argv=None):
    # conversion is host-side tooling: never initialize an accelerator
    # backend (a dequantize otherwise blocks on TPU device init)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the embedding process

    p = argparse.ArgumentParser(description="Convert audio model checkpoints")
    p.add_argument("--model", "--hf-path", required=True)
    p.add_argument("--output-path", "--mlx-path", default=None)
    p.add_argument("-q", "--quantize", action="store_true")
    p.add_argument("--q-bits", type=int, default=4, choices=[2, 3, 4, 6, 8])
    p.add_argument("--q-group-size", type=int, default=64)
    p.add_argument("--q-recipe", "--quant-predicate", default=None,
                   choices=list(QUANT_RECIPES))
    p.add_argument("-d", "--dequantize", action="store_true")
    p.add_argument("--dtype", default=None,
                   choices=["float16", "bfloat16", "float32"])
    p.add_argument("--upload-repo", default=None)
    p.add_argument("--revision", default=None,
                   help="HF revision (branch/tag/commit) to download")
    p.add_argument("--model-domain", default=None,
                   choices=["tts", "stt", "sts", "vad", "codec"],
                   help="Override domain detection")
    args = p.parse_args(argv)
    convert(
        args.model, args.output_path, args.quantize, args.q_bits,
        args.q_group_size, args.q_recipe, args.dequantize, args.dtype,
        args.upload_repo, args.revision, args.model_domain,
    )


if __name__ == "__main__":
    main()
