"""VAD/diarization subpackage. Mirrors the reference export surface
(reference vad/__init__.py: ``load``, ``load_model``) via PEP 562 lazy
attributes so ``import mlx_audio_tpu.vad`` stays dependency-free.
"""

__all__ = ["load", "load_model"]


def __getattr__(name):
    if name in __all__:
        from . import utils

        # `load` is the documented alias of `load_model`
        # (reference vad/utils.py:36-60).
        return utils.load_model
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
