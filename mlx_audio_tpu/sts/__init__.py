"""Speech-to-speech subpackage. Mirrors the reference export surface
(reference sts/__init__.py: SAMAudio family, MossFormer2-SE family,
``VoicePipeline``) via PEP 562 lazy attributes so ``import
mlx_audio_tpu.sts`` stays dependency-free until a symbol is touched.
"""

_SAM = ("SAMAudio", "SAMAudioProcessor", "SeparationResult", "Batch",
        "save_audio", "SAMAudioConfig")
_MOSS = ("MossFormer2SE", "MossFormer2SEConfig", "MossFormer2SEModel")

__all__ = list(_SAM) + list(_MOSS) + ["VoicePipeline"]


def __getattr__(name):
    if name in _SAM:
        if name == "save_audio":
            from .models.sam_audio.model import save_audio

            return save_audio
        if name == "Batch":
            from .models.sam_audio.model import Batch

            return Batch
        from .models import sam_audio

        return getattr(sam_audio, name)
    if name in _MOSS:
        from .models import mossformer2_se

        return getattr(mossformer2_se, name)
    if name == "VoicePipeline":
        from .voice_pipeline import VoicePipeline

        return VoicePipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
