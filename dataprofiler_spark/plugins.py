"""Plugin registry.

Reference: plugins/__init__.py:7-29 (load_plugins walks a plugins dir),
plugins/decorators.py (plugin_decorator registry). Same surface: register
named plugins by type, look them up, optionally load a directory of
modules.
"""

from __future__ import annotations

import importlib.util
import os

_REGISTRY: dict[str, dict[str, object]] = {}


def plugin(plugin_type: str, name: str):
    """@plugin("preset", "my_preset") — register a callable."""
    def deco(fn):
        _REGISTRY.setdefault(plugin_type, {})[name] = fn
        return fn
    return deco


def get_plugins(plugin_type: str) -> dict[str, object]:
    return dict(_REGISTRY.get(plugin_type, {}))


def load_plugins(directory: str) -> int:
    """Import every .py in a directory (module import runs its @plugin
    decorators). Returns count of modules loaded."""
    n = 0
    if not os.path.isdir(directory):
        return 0
    for fname in sorted(os.listdir(directory)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        path = os.path.join(directory, fname)
        spec = importlib.util.spec_from_file_location(fname[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        n += 1
    return n
