"""TTS model registry (reference: mlx_audio/tts/utils.py:19-120)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Union

from ..utils import base_load_model

MODEL_REMAPPING = {
    "qwen3_tts": "qwen3_tts",
    "outetts": "outetts",
    "spark": "spark",
    "marvis": "sesame",
    "csm": "sesame",
    "voxcpm": "voxcpm",
    "voxcpm1.5": "voxcpm",
    "vibevoice_streaming": "vibevoice",
    "chatterbox_turbo": "chatterbox_turbo",
    "soprano": "soprano",
    "echo_tts": "echo_tts",
    "orpheus": "llama",
    "vyvo": "qwen3",
}


def get_available_models() -> List[str]:
    models_dir = Path(__file__).parent / "models"
    return sorted(
        d.name
        for d in models_dir.iterdir()
        if d.is_dir() and not d.name.startswith("__")
    )


def load_model(model_path: Union[str, Path], lazy: bool = False,
               strict: bool = False, **kwargs):
    return base_load_model(
        model_path=model_path,
        category="tts",
        model_remapping=MODEL_REMAPPING,
        lazy=lazy,
        strict=strict,
        **kwargs,
    )


def convert(hf_path: str, mlx_path: str = "converted_model",
            quantize: bool = False, q_group_size: int = 64, q_bits: int = 4,
            dtype: str = None, upload_repo: str = None, revision=None,
            dequantize: bool = False, quant_predicate: str = None, **kwargs):
    """Legacy per-domain convert wrapper (reference tts/utils.py:225-320) —
    delegates to the package-level converter."""
    from ..convert import convert as _convert

    return _convert(
        hf_path, mlx_path, quantize=quantize, q_bits=q_bits,
        q_group_size=q_group_size, q_recipe=quant_predicate,
        dequantize=dequantize, dtype=dtype, upload_repo=upload_repo,
        revision=revision,
    )


def load(model_path: Union[str, Path], lazy: bool = False,
         strict: bool = True, **kwargs):
    """Alias of load_model (reference tts/utils.py:117-143)."""
    return load_model(model_path, lazy=lazy, strict=strict, **kwargs)


def get_model_and_args(model_type: str, model_name: List[str]):
    """Resolve the model architecture module by type/name parts
    (reference tts/utils.py:59-114)."""
    from ..utils import get_model_class

    return get_model_class(model_type, model_name, category="tts",
                           model_remapping=MODEL_REMAPPING)


def fetch_from_hub(model_path: Path, lazy: bool = False, **kwargs):
    """(model, config) pair (reference tts/utils.py:145-150)."""
    from ..utils import load_config

    return (load_model(model_path, lazy=lazy, **kwargs),
            load_config(model_path))


def upload_to_hub(path: str, upload_repo: str, hf_path: str):
    """Upload a converted model directory (reference tts/utils.py:153-185).
    `hf_path` names the source model in the generated card."""
    from huggingface_hub import HfApi

    from ..convert import generate_readme

    generate_readme(Path(path), hf_path, {})
    api = HfApi()
    api.create_repo(upload_repo, exist_ok=True)
    api.upload_folder(folder_path=str(path), repo_id=upload_repo)
    return upload_repo
