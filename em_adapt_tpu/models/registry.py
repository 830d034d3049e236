"""Model registry.

The reference hardcodes one architecture (ADAPT, reference deeplab.py:12).
The rebuild keeps a registry so additional segmentation backbones slot in
behind the same trainer.
"""

from __future__ import annotations

_REGISTRY: dict[str, type] = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_model(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
