"""STT subpackage. Mirrors the reference export surface
(reference stt/__init__.py: ``load``, ``load_model``) via PEP 562 lazy
attributes so ``import mlx_audio_tpu.stt`` stays dependency-free.
"""

__all__ = ["load", "load_model"]


def __getattr__(name):
    if name in __all__:
        from . import utils

        # `load` is the documented alias of `load_model`
        # (reference stt/utils.py:85-110).
        return utils.load_model
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
