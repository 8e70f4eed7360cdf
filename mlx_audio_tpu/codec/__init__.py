"""Neural-codec subpackage. Mirrors the reference export surface
(reference codec/__init__.py → codec/models/__init__.py: ``DAC``,
``Encodec``, ``Mimi``, ``SNAC``, ``Vocos``) via PEP 562 lazy attributes.
"""

__all__ = ["DAC", "Encodec", "Mimi", "SNAC", "Vocos"]


def __getattr__(name):
    if name in __all__:
        from . import models

        return getattr(models, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
