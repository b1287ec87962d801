"""Examples stay importable: every script under examples/ must load (imports
+ definitions execute) against the current API. Guards the tutorials against
API drift without paying their full runtimes.
"""
import importlib.util
import os
import pathlib

import pytest

EXAMPLES = sorted(
    pathlib.Path(__file__).resolve().parent.parent.joinpath("examples")
    .glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports(path):
    spec = importlib.util.spec_from_file_location(
        "example_" + path.stem, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    # every example exposes a main() guarded by __main__ (process_diffusion
    # is a ProcessBase CLI subclass instead)
    assert hasattr(module, "main") or "process" in path.stem
