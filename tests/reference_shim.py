"""Import the actual reference library (/root/reference/mlmc) under
numpy 2 / py3.12 — shims documented in BASELINE.md measurement notes.

Used by the cross-validation tests that assert this framework and the
reference produce identical estimates on identical stored samples.
"""
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def import_reference():
    """Returns the reference ``mlmc`` package (shimmed); caches in sys.modules."""
    if "mlmc" in sys.modules:
        return sys.modules["mlmc"]

    # numpy 2 removed these aliases the reference still touches
    for name, repl in [("VisibleDeprecationWarning", DeprecationWarning),
                       ("float", float), ("int", int), ("bool", bool),
                       ("object", object)]:
        if not hasattr(np, name):
            setattr(np, name, repl)

    if "ruamel" not in sys.modules:  # not installed; only used by workspace sims
        ruamel = types.ModuleType("ruamel")
        ruamel_yaml = types.ModuleType("ruamel.yaml")

        class _YAML:
            def __init__(self, *a, **k):
                pass

            def load(self, stream):
                import yaml as _pyyaml
                return _pyyaml.safe_load(stream)

            def dump(self, data, stream):
                import yaml as _pyyaml
                _pyyaml.safe_dump(data, stream)

        ruamel_yaml.YAML = _YAML
        ruamel_yaml.__path__ = []  # mark as package so submodules import
        ruamel_yaml_error = types.ModuleType("ruamel.yaml.error")
        ruamel_yaml_error.ReusedAnchorWarning = type(
            "ReusedAnchorWarning", (Warning,), {})
        ruamel_yaml_error.UnsafeLoaderWarning = type(
            "UnsafeLoaderWarning", (Warning,), {})
        ruamel_yaml.error = ruamel_yaml_error
        ruamel.yaml = ruamel_yaml
        sys.modules["ruamel"] = ruamel
        sys.modules["ruamel.yaml"] = ruamel_yaml
        sys.modules["ruamel.yaml.error"] = ruamel_yaml_error

    if "memoization" not in sys.modules:  # not installed; provide real caching
        memoization = types.ModuleType("memoization")

        def cached(max_size=None, custom_key_maker=None):
            def deco(fn):
                cache = {}

                def wrapper(*args, **kwargs):
                    key = (custom_key_maker(*args, **kwargs)
                           if custom_key_maker else (args, tuple(kwargs.items())))
                    try:
                        return cache[key]
                    except KeyError:
                        cache[key] = fn(*args, **kwargs)
                        return cache[key]

                wrapper.cache_clear = cache.clear
                return wrapper

            return deco

        memoization.cached = cached
        sys.modules["memoization"] = memoization

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import mlmc  # noqa: E402
    return mlmc
