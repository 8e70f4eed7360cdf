"""Import hygiene (reference mlx_audio/tests/test_lazy_imports.py): the
package root and the loader modules must not pull heavy optional deps
(torch, transformers, scipy) at import time, and the packaging metadata
must expose the reference's console entry points (pyproject.toml:88-92)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHECK = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import mlx_audio_tpu
import mlx_audio_tpu.utils
import mlx_audio_tpu.dsp
import mlx_audio_tpu.audio_io
import mlx_audio_tpu.nn
heavy = [m for m in ("torch", "transformers", "scipy") if m in sys.modules]
assert not heavy, f"heavy deps imported eagerly: {{heavy}}"
# importing must not initialize any jax backend (a device-array created at
# module scope would trigger the TPU tunnel handshake on bare import)
assert not jax._src.xla_bridge._backends, list(jax._src.xla_bridge._backends)
print("OK")
"""


def test_no_heavy_imports_at_package_import():
    out = subprocess.run(
        [sys.executable, "-c", CHECK.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_console_entry_points_declared():
    text = (REPO / "pyproject.toml").read_text()
    for script in (
        "mlx_audio_tpu.convert",
        "mlx_audio_tpu.stt.generate",
        "mlx_audio_tpu.tts.generate",
        "mlx_audio_tpu.server",
    ):
        assert f'"{script}"' in text, f"missing console script {script}"


def test_entry_point_mains_importable():
    from mlx_audio_tpu import convert, server
    from mlx_audio_tpu.stt import generate as stt_gen
    from mlx_audio_tpu.tts import generate as tts_gen

    for mod in (convert, server, stt_gen, tts_gen):
        assert callable(getattr(mod, "main"))


def test_compile_cache_opt_in():
    """MLX_AUDIO_TPU_COMPILE_CACHE=<dir> enables the persistent XLA
    compilation cache (opt-in; cold-server compile latency mitigation)."""
    code = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
d = tempfile.mkdtemp()
os.environ["MLX_AUDIO_TPU_COMPILE_CACHE"] = d
import jax
jax.config.update("jax_platforms", "cpu")
import mlx_audio_tpu
assert jax.config.jax_compilation_cache_dir == d
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_subpackage_export_surface():
    """Reference users rely on `from mlx_audio.tts import load, load_model`
    (reference tts/stt/vad `__init__.py`), `mlx_audio.sts`'s SAMAudio /
    MossFormer2 / VoicePipeline exports, and `mlx_audio.codec`'s codec
    classes. Ours resolve lazily (PEP 562) but must resolve."""
    import mlx_audio_tpu.codec as codec
    import mlx_audio_tpu.sts as sts
    import mlx_audio_tpu.stt as stt
    import mlx_audio_tpu.tts as tts
    import mlx_audio_tpu.vad as vad

    for pkg in (tts, stt, vad):
        assert callable(pkg.load) and callable(pkg.load_model)
    for name in ("SAMAudio", "SAMAudioProcessor", "SeparationResult",
                 "Batch", "save_audio", "SAMAudioConfig", "MossFormer2SE",
                 "MossFormer2SEConfig", "MossFormer2SEModel",
                 "VoicePipeline"):
        assert getattr(sts, name) is not None
    for name in ("DAC", "Encodec", "Mimi", "SNAC", "Vocos"):
        assert getattr(codec, name) is not None
    import pytest

    with pytest.raises(AttributeError):
        tts.no_such_symbol


def test_optional_dependency_matrix():
    """Extras matrix is well-formed (reference tests/test_optional_deps.py,
    offline variant: validate pyproject structure instead of dry-run
    installs, which need network)."""
    import tomllib

    root = Path(__file__).parent.parent
    with open(root / "pyproject.toml", "rb") as f:
        proj = tomllib.load(f)["project"]

    extras = proj["optional-dependencies"]
    for group in ("stt", "tts", "server", "sts", "all", "dev"):
        assert group in extras and extras[group], f"empty extra [{group}]"

    # umbrella extras reference the package's own groups
    def self_refs(reqs):
        out = set()
        for r in reqs:
            if r.startswith("mlx-audio-tpu["):
                out.update(r.split("[", 1)[1].rstrip("]").split(","))
        return out

    assert {"stt", "tts"} <= self_refs(extras["sts"])
    assert {"stt", "tts", "server"} <= self_refs(extras["all"])
    # every self-referenced group must exist
    for group in self_refs(extras["sts"]) | self_refs(extras["all"]):
        assert group in extras, f"[all]/[sts] references unknown [{group}]"

    # core deps must not include any torch/optional-only packages
    core = {r.split(">=")[0].split("<")[0].strip() for r in proj["dependencies"]}
    assert "torch" not in core and "transformers" not in core
    assert {"jax", "numpy", "safetensors"} <= core


def test_no_device_side_complex_exp():
    """Complex Exp is UNIMPLEMENTED on some TPU backends (hit on-chip in
    the HiFT vocoder): mag*exp(1j*phase) must be written as
    lax.complex(mag*cos, mag*sin). Guard the whole package; host-side
    numpy (np.exp) is exempt (sesame watermarking runs on host)."""
    import mlx_audio_tpu

    pkg = Path(mlx_audio_tpu.__file__).parent
    offenders = []
    for path in pkg.rglob("*.py"):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "1j" in line and "jnp.exp" in line:
                offenders.append(f"{path.relative_to(pkg)}:{i}: {line.strip()}")
    assert not offenders, (
        "device-side complex exp found (use lax.complex(mag*cos, mag*sin)):\n"
        + "\n".join(offenders)
    )
