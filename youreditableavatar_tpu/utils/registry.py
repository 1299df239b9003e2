"""String → class registry decoupling config names from implementations.

Capability parity with the reference registry (`tetgs_spatial/__init__.py:1-13`):
components register under a stable string name and are looked up when a config
names them. Unlike the reference (module-attribute mutation) this is an explicit
dict with collision checking.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Type

_REGISTRY: Dict[str, Type[Any]] = {}


def register(name: str) -> Callable[[Type[Any]], Type[Any]]:
    """Class decorator: ``@register("implicit-sdf")``."""

    def decorator(cls: Type[Any]) -> Type[Any]:
        existing = _REGISTRY.get(name)
        if existing is not None and existing is not cls:
            raise ValueError(
                f"registry name {name!r} already bound to {existing.__qualname__}"
            )
        _REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return decorator


def find(name: str) -> Type[Any]:
    """Look up a registered class by name."""
    try:
        return _REGISTRY[name]
    except KeyError:
        known = ", ".join(sorted(_REGISTRY)) or "<empty>"
        raise KeyError(f"unknown component {name!r}; registered: {known}") from None


def names() -> list[str]:
    return sorted(_REGISTRY)
