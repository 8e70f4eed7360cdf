"""Model loading / registry / weight utilities.

Same public contract as the reference loader (/root/reference/mlx_audio/
utils.py:106-404): `get_model_path` (HF snapshot or local dir),
`load_config`, `load_weights` (safetensors/npz → numpy dict),
`apply_quantization` (config-driven, per-layer predicates),
`get_model_class` (models-dir scan + remapping), `base_load_model`, and the
domain-sniffing `load_model`. Internals are JAX-native: weights become
pytree leaves assigned by dotted key; quantization swaps in
QuantizedLinear/QuantizedEmbedding *before* weight assignment (functional
modules can't be mutated after jit).
"""

from __future__ import annotations

import dataclasses
import glob
import importlib
import json
import logging
from pathlib import Path
from typing import List, Optional, Tuple, Type, TypeVar, Union, get_origin, get_type_hints

import numpy as np

from . import nn as tnn

T = TypeVar("T")

logger = logging.getLogger(__name__)


def fetch_array(arr, *, tries: int = 4, delay: float = 2.0) -> np.ndarray:
    """Device→host fetch with bounded retry on transient allocator pressure.

    Right after a very large program executes (e.g. SAM-Audio's 2.8B-param
    DiT ODE), the first transfer can fail RESOURCE_EXHAUSTED even though
    headroom exists once the program's workspace is released. Retry after
    collecting garbage (drops dead jax.Array handles, freeing their device
    buffers) and a short pause. Anything other than RESOURCE_EXHAUSTED, or
    exhaustion of the retry budget, re-raises.
    """
    import gc
    import time

    for attempt in range(tries):
        try:
            return np.asarray(arr)
        except Exception as exc:  # jax.errors.JaxRuntimeError
            if "RESOURCE_EXHAUSTED" not in str(exc) or attempt == tries - 1:
                raise
            logger.warning(
                "device fetch hit RESOURCE_EXHAUSTED (attempt %d/%d); "
                "retrying after gc", attempt + 1, tries)
            gc.collect()
            time.sleep(delay * (attempt + 1))
    raise AssertionError("unreachable")

DEFAULT_ALLOW_PATTERNS = [
    "*.json",
    "*.safetensors",
    "*.py",
    "*.model",
    "*.tiktoken",
    "*.txt",
    "*.jsonl",
    "*.yaml",
    "*.wav",
    "*.pth",
    "*.npz",
    "*.npy",
]


def from_dict(data_class: Type[T], data: dict) -> T:
    """Recursively build a dataclass from a dict, ignoring unknown keys."""
    if not dataclasses.is_dataclass(data_class):
        raise TypeError(f"{data_class} is not a dataclass")
    field_types = get_type_hints(data_class)
    kwargs = {}
    for field in dataclasses.fields(data_class):
        if field.name not in data:
            continue
        value = data[field.name]
        ftype = field_types[field.name]
        origin = get_origin(ftype)
        if origin is Union:
            args = [a for a in ftype.__args__ if a is not type(None)]
            if args:
                ftype = args[0]
        if dataclasses.is_dataclass(ftype) and isinstance(value, dict):
            value = from_dict(ftype, value)
        kwargs[field.name] = value
    return data_class(**kwargs)


def _is_local_path(path: str) -> bool:
    return (
        path.startswith(".")
        or path.startswith("/")
        or path.startswith("~")
        or (len(path) > 1 and path[1] == ":")
    )


def get_model_path(
    path_or_hf_repo: str,
    revision: Optional[str] = None,
    force_download: bool = False,
    allow_patterns: Optional[List[str]] = None,
) -> Path:
    """Resolve a local dir or download a HuggingFace snapshot."""
    model_path = Path(path_or_hf_repo).expanduser()
    if model_path.exists():
        return model_path
    if _is_local_path(path_or_hf_repo):
        raise FileNotFoundError(f"Local model path not found: {path_or_hf_repo}")
    from huggingface_hub import snapshot_download

    return Path(
        snapshot_download(
            repo_id=path_or_hf_repo,
            revision=revision,
            force_download=force_download,
            allow_patterns=allow_patterns or DEFAULT_ALLOW_PATTERNS,
        )
    )


def load_config(model_path: Union[str, Path], **kwargs) -> dict:
    if isinstance(model_path, str):
        model_path = get_model_path(model_path, **kwargs)
    config_file = Path(model_path) / "config.json"
    if config_file.exists():
        with open(config_file, encoding="utf-8") as f:
            return json.load(f)
    raise FileNotFoundError(f"Config not found at {model_path}")


def load_hf_tokenizer(model_path: Union[str, Path], trust_remote_code: bool = True):
    """AutoTokenizer from a checkpoint dir, silencing the harmless
    model_type-mismatch warning transformers emits for custom model types
    (reference qwen3_asr.py:789-804). Used by per-model post_load_hooks /
    lazy tokenizer resolvers so `load_model(path).generate(...)` works
    without a manual set_runtime() call."""
    import transformers
    from transformers import AutoTokenizer

    prev = transformers.logging.get_verbosity()
    transformers.logging.set_verbosity_error()
    try:
        return AutoTokenizer.from_pretrained(
            str(model_path), trust_remote_code=trust_remote_code
        )
    finally:
        transformers.logging.set_verbosity(prev)


def resolve_runtime_tokenizer(model, runtime: dict, name: str):
    """Shared tokenizer resolution for models wired via set_runtime():
    explicit runtime slot → lazy AutoTokenizer from the checkpoint dir
    recorded at load time → clear error. Mirrors the reference's
    post_load_hook eager loads (qwen3_asr.py:797, glmasr.py:519,
    vibevoice_asr.py:403, funasr.py:952)."""
    tok = runtime.get("tokenizer")
    if tok is None:
        cfg = (getattr(model, "config", None) or getattr(model, "args", None)
               or getattr(model, "dims", None))
        model_path = getattr(cfg, "model_path", None)
        if model_path:
            try:
                tok = load_hf_tokenizer(model_path)
            except Exception as exc:
                raise RuntimeError(
                    f"{name} tokenizer not set and could not be loaded "
                    f"from {model_path}: {exc}"
                ) from exc
            runtime["tokenizer"] = tok
    if tok is None:
        raise RuntimeError(
            f"{name} tokenizer not set — call set_runtime(tokenizer=...) "
            "or load the model from a checkpoint dir via load_model()"
        )
    return tok


def load_weight_files(model_path: Path) -> dict:
    """Load all weights in a model dir → {key: np.ndarray}.

    safetensors preferred, then npz, then torch pickles (.pt/.pth/.bin —
    covers original upstream releases like OpenAI whisper, reference
    utils.py:177-204 behavior). A single weight file path also works."""
    model_path = Path(model_path)
    if model_path.is_file():
        return _load_one_weight_file(model_path)
    weight_files = sorted(glob.glob(str(model_path / "*.safetensors")))
    weights: dict = {}
    if weight_files:
        from safetensors.numpy import load_file

        for wf in weight_files:
            weights.update(load_file(wf))
        return weights
    npz_files = sorted(glob.glob(str(model_path / "*.npz")))
    if npz_files:
        for wf in npz_files:
            with np.load(wf) as data:
                weights.update({k: data[k] for k in data.files})
        return weights
    torch_files = sorted(
        f for pat in ("*.pt", "*.pth", "*.bin", "*.ckpt")
        for f in glob.glob(str(model_path / pat))
        if not Path(f).name.startswith(("training_args", "optimizer",
                                        "scheduler", "rng_state"))
    )
    if not torch_files:
        raise FileNotFoundError(
            f"No weight files (safetensors/npz/pt) found in {model_path}"
        )
    loaded_any = False
    errors = []
    for wf in torch_files:
        try:
            weights.update(_load_one_weight_file(Path(wf)))
            loaded_any = True
        except Exception as e:  # non-weight pickle alongside the weights
            errors.append(f"{Path(wf).name}: {e}")
    if not loaded_any:
        raise ValueError(
            f"No torch file in {model_path} contained weights: {errors}")
    return weights


def _load_one_weight_file(path: Path) -> dict:
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(path))
    if path.suffix == ".npz":
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    if path.suffix in (".pt", ".pth", ".bin", ".ckpt"):
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        for key in ("state_dict", "model_state_dict", "model"):
            if isinstance(state, dict) and key in state and isinstance(
                    state[key], dict):
                state = state[key]
                break
        return {
            k: v.detach().cpu().numpy()
            for k, v in state.items()
            if hasattr(v, "detach")
        }
    raise ValueError(f"Unsupported weight file: {path}")


# Back-compat alias matching the reference name (utils.py:177)
load_weights_dict = load_weight_files


def apply_quantization(
    model: tnn.Module,
    config: dict,
    weights: dict,
    model_quant_predicate=None,
) -> tnn.Module:
    """Swap Linear/Embedding → Quantized* per the config `quantization` block.

    Decision per layer path (mirrors reference utils.py:207-251): model
    predicate may veto/override; per-path overrides in the quantization
    block; otherwise quantize iff `{path}.scales` exists in the checkpoint.
    """
    quantization = config.get("quantization", None)
    if quantization is None:
        return model

    def predicate(path: str, module):
        if hasattr(module, "weight") and getattr(module.weight, "size", 0) % 64 != 0:
            return False
        if model_quant_predicate is not None:
            r = model_quant_predicate(path, module)
            if isinstance(r, dict):
                return r
            if not r:
                return False
        if path in quantization:
            override = quantization[path]
            if isinstance(override, dict):
                return override
            if not override:
                return False
        return f"{path}.scales" in weights

    return tnn.quantize_module(
        model,
        group_size=quantization.get("group_size", 64),
        bits=quantization.get("bits", 4),
        predicate=predicate,
    )


def get_model_class(
    model_type: str,
    model_name: Optional[List[str]],
    category: str,
    model_remapping: dict,
) -> Tuple:
    """Resolve the architecture module for a model type/name.

    Stage 1: remapping dict; stage 2: partial matches of model-name parts
    against the models/ directory scan (reference utils.py:254-313).
    """
    model_type_mapped = model_remapping.get(model_type, None)

    models_dir = Path(__file__).parent / category / "models"
    available = [
        d.name
        for d in models_dir.iterdir()
        if d.is_dir() and not d.name.startswith("__")
    ] if models_dir.is_dir() else []

    if model_name is not None and model_type_mapped != model_type:
        for part in model_name:
            if part in available:
                model_type = part
            if part in model_remapping:
                model_type = model_remapping[part]
                break
        if model_type_mapped is not None and model_type not in available:
            model_type = model_type_mapped
    elif model_type_mapped is not None:
        model_type = model_type_mapped

    module_path = f"mlx_audio_tpu.{category}.models.{model_type}"
    try:
        arch = importlib.import_module(module_path)
    except ImportError as e:
        if e.name != module_path:
            raise ImportError(
                f"Missing dependency while loading {model_type}: {e}"
            ) from e
        msg = f"Model type {model_type} not supported for {category}."
        logger.error(msg)
        raise ValueError(msg)
    return arch, model_type


def base_load_model(
    model_path: Union[str, Path],
    category: str,
    model_remapping: dict,
    lazy: bool = False,
    strict: bool = False,
    **kwargs,
):
    """Shared loader: resolve → config → class → build → sanitize →
    quantize → assign weights → post_load_hook (reference utils.py:316-404)."""
    model_name = None
    if isinstance(model_path, str):
        model_name = model_path.lower().split("/")[-1].split("-")
        model_path = get_model_path(
            model_path,
            revision=kwargs.get("revision", None),
            force_download=kwargs.get("force_download", False),
        )
    elif isinstance(model_path, Path):
        try:
            index = model_path.parts.index("hub")
            model_name = model_path.parts[index + 1].lower().split("--")[-1].split("-")
        except ValueError:
            model_name = model_path.name.lower().split("-")
    else:
        raise ValueError(f"Invalid model path type: {type(model_path)}")

    config = load_config(model_path)
    config["model_path"] = str(model_path)

    model_type = config.get("model_type") or config.get("architecture")
    if model_type is None and model_name is not None:
        model_type = model_name[0].lower()

    model_class, model_type = get_model_class(
        model_type=model_type,
        model_name=model_name,
        category=category,
        model_remapping=model_remapping,
    )

    model_config = (
        model_class.ModelConfig.from_dict(config)
        if hasattr(model_class, "ModelConfig")
        else config
    )
    model = model_class.Model(model_config)

    weights = load_weight_files(model_path)
    if hasattr(model, "sanitize"):
        weights = model.sanitize(weights)

    model = apply_quantization(
        model, config, weights, getattr(model, "model_quant_predicate", None)
    )

    model = tnn.load_weights(model, weights, strict=strict)
    model = model.eval()

    # Record where the checkpoint lives so runtime pieces (tokenizers,
    # sibling codec weights) can be lazily resolved from the same dir —
    # reference models do this eagerly in their post_load_hooks
    # (e.g. qwen3_asr.py:789-817); lazy keeps load cheap and lets
    # random-weight tests construct models without tokenizer files.
    try:
        cfg = (getattr(model, "config", None) or getattr(model, "args", None)
               or getattr(model, "dims", None))
        if cfg is not None and getattr(cfg, "model_path", None) is None:
            cfg.model_path = str(model_path)
    except Exception:
        pass

    if hasattr(type(model), "post_load_hook"):
        model = type(model).post_load_hook(model, model_path)
    model = maybe_shard_for_serving(model)
    # Post-load: row-stack quantized q/k/v and gate/up siblings into fused
    # GEMVs (TP shards are skipped via their tp_sharded flag; no-op on
    # float models). Must run after weights land — the checkpoint's
    # dotted-key layout keeps per-projection modules (reference
    # utils.py:207-251 contract); the fused layout is runtime-only.
    tnn.fuse_quantized_projections(model)
    return model


def maybe_shard_for_serving(model):
    """Opt-in tensor-parallel serving: MLX_AUDIO_TPU_TP=N shards every
    loaded model's projection weights over an N-way `model` mesh axis
    (Llama/Qwen + DiT naming rules; unmatched leaves replicate). Lets
    checkpoints that exceed one chip's HBM (VibeVoice-ASR 9B bf16 ≈
    18 GB) serve across chips with no per-model code."""
    import os

    tp = int(os.environ.get("MLX_AUDIO_TPU_TP", "0") or 0)
    if tp <= 1:
        return model
    from .parallel import (
        DIT_TP_RULES,
        LLAMA_TP_RULES,
        get_mesh,
        shard_module,
    )

    mesh = get_mesh(data=-1, model=tp)
    return shard_module(model, mesh, LLAMA_TP_RULES + DIT_TP_RULES)


# -----------------------------------------------------------------------------
# Domain-agnostic load_model (sniffs tts/stt/vad like reference utils.py:619)
# -----------------------------------------------------------------------------

_STT_TYPES = {
    "whisper", "parakeet", "voxtral", "voxtral_realtime", "qwen3_asr",
    "vibevoice_asr", "funasr", "glmasr", "lasr", "lasr_ctc", "wav2vec",
    "wav2vec2",
}
_VAD_TYPES = {"sortformer", "smart_turn"}


def get_model_name_parts(model_path: Union[str, Path]) -> List[str]:
    """Lowercased dash-split tokens of the repo/dir name, used as category
    hints when config lacks model_type (reference utils.py:657-667)."""
    name = str(model_path).rstrip("/").split("/")[-1]
    return name.lower().split("--")[-1].split("-")


def get_model_category(model_type: Optional[str],
                       name_parts: Optional[List[str]] = None) -> Optional[str]:
    """tts / stt / vad from model_type or name hints
    (reference utils.py:619-655): registry remapping keys first, then
    direct model-package names."""
    import importlib.util

    candidates = [h for h in [model_type] + list(name_parts or []) if h]

    def _remaps():
        from .stt.utils import MODEL_REMAPPING as stt_remap
        from .tts.utils import MODEL_REMAPPING as tts_remap
        from .vad.utils import MODEL_REMAPPING as vad_remap

        return [("tts", tts_remap), ("stt", stt_remap), ("vad", vad_remap)]

    categories = _remaps()
    for category, remap in categories:
        for hint in candidates:
            if hint in remap:
                return category
    for category, _ in categories:
        for hint in candidates:
            if not hint.isidentifier():
                continue
            spec = importlib.util.find_spec(
                f"{__package__}.{category}.models.{hint}")
            if spec is not None:
                return category
    return None


def load_model(model_path: Union[str, Path], **kwargs):
    """Load a model, sniffing its domain from config/model_type, with
    repo-name hints as fallback (reference utils.py:669-704)."""
    path = (
        get_model_path(model_path) if isinstance(model_path, str) else Path(model_path)
    )
    try:
        config = load_config(path)
    except FileNotFoundError:
        config = {}
    model_type = (config.get("model_type") or "").lower().replace("-", "_")

    if not model_type:
        category = get_model_category(None, get_model_name_parts(model_path))
        if category == "stt":
            from .stt.utils import load_model as load_stt

            return load_stt(path, **kwargs)
        if category == "vad":
            from .vad.utils import load_model as load_vad

            return load_vad(path, **kwargs)
        if category == "tts":
            from .tts.utils import load_model as load_tts

            return load_tts(path, **kwargs)

    if model_type in _STT_TYPES:
        from .stt.utils import load_model as load_stt

        return load_stt(path, **kwargs)
    if model_type in _VAD_TYPES:
        from .vad.utils import load_model as load_vad

        return load_vad(path, **kwargs)
    from .tts.utils import load_model as load_tts

    try:
        return load_tts(path, **kwargs)
    except (ValueError, ImportError):
        from .stt.utils import load_model as load_stt

        return load_stt(path, **kwargs)


# -----------------------------------------------------------------------------
# Audio loading helper (reference utils.py:507)
# -----------------------------------------------------------------------------


def load_audio(
    path: Union[str, Path],
    sample_rate: Optional[int] = None,
    dtype=np.float32,
    mono: bool = True,
    length: Optional[int] = None,
    volume_normalize: bool = False,
    segment_duration: Optional[float] = None,
) -> np.ndarray:
    """Read an audio file → float32 samples, optionally resampled to
    `sample_rate` (polyphase, like the reference's stt/utils.py:21-28).

    The extra options mirror the reference top-level loader
    (reference utils.py:507-575): `length` pads/truncates to an exact
    sample count, `volume_normalize` applies percentile volume
    normalization, and `segment_duration` randomly selects a clip of
    that many seconds (requires `sample_rate`).
    """
    from . import audio_io

    x, sr = audio_io.read(path)
    if mono and x.ndim == 2:
        x = x.mean(axis=1)
    if sample_rate is not None and sr != sample_rate:
        x = resample_audio(x, sr, sample_rate)
        sr = sample_rate
    x = x.astype(dtype)
    if segment_duration is not None:
        x = random_select_audio_segment(x, int(segment_duration * sr))
    if volume_normalize:
        x = audio_volume_normalize(x)
    if length is not None:
        if x.shape[0] < length:
            x = np.pad(x, (0, length - x.shape[0]))
        else:
            x = x[:length]
    return x


def audio_volume_normalize(audio: np.ndarray, coeff: float = 0.2) -> np.ndarray:
    """Percentile-based volume normalization (reference utils.py:443-483):
    scale so the mean of the 90th-99th percentile |sample| values hits
    `coeff`, with a 0.1× – 10× clamp and a final |x| ≤ 1 guarantee."""
    audio = np.asarray(audio)
    temp = np.sort(np.abs(audio))
    if temp.size == 0:
        return audio
    if temp[-1] < 0.1:
        audio = audio / max(float(temp[-1]), 1e-3) * 0.1
        temp = np.sort(np.abs(audio))
    temp = temp[temp > 0.01]
    if temp.shape[0] <= 10:
        return audio
    volume = float(np.mean(temp[int(0.9 * len(temp)): int(0.99 * len(temp))]))
    audio = audio * np.clip(coeff / volume, 0.1, 10)
    max_value = float(np.max(np.abs(audio)))
    if max_value > 1:
        audio = audio / max_value
    return audio


def random_select_audio_segment(audio: np.ndarray, length: int) -> np.ndarray:
    """Random fixed-length clip, zero-padded if too short
    (reference utils.py:485-505)."""
    import random

    audio = np.asarray(audio)
    if audio.shape[0] < length:
        audio = np.pad(audio, (0, int(length - audio.shape[0])))
    start = random.randint(0, audio.shape[0] - length)
    return audio[start: start + length]


def resample_audio(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    try:
        from . import native

        if native.available() and x.dtype == np.float32 and x.ndim <= 2:
            return native.resample_poly(x, target_sr, orig_sr)
    except (RuntimeError, ImportError):
        pass
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g, axis=0).astype(x.dtype)


def load_weights(model_path) -> dict:
    """Weights dict from a checkpoint dir's safetensors/npz files
    (reference utils.py:177-204). Distinct from nn.module.load_weights,
    which assigns a dict INTO a module tree."""
    return load_weight_files(Path(model_path))


def is_valid_module_name(name: str) -> bool:
    """reference utils.py:611-616."""
    if not name or not isinstance(name, str):
        return False
    return name[0].isalpha() or name[0] == "_"
