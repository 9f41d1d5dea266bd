"""Smoke tests: every ``examples/*.py`` runs to completion.

The reference's notebooks double as its examples and are exercised by
mirrored test workloads (SURVEY.md §4); here the example scripts
themselves run end-to-end in their small mode (``main(small=True)``)
so a regression in any script fails the suite instead of shipping
silently.
"""
import importlib.util
import os
import sys

import pytest

_EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples")

EXAMPLES = sorted(
    f[:-3] for f in os.listdir(_EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(_EXAMPLES_DIR, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_example_list_is_current():
    # the parametrization below covers every script in examples/
    assert EXAMPLES, "examples/ directory is empty?"


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    mod = _load(name)
    assert hasattr(mod, "main"), f"examples/{name}.py has no main()"
    mod.main(small=True)
    out = capsys.readouterr().out
    assert out.strip(), f"examples/{name}.py printed nothing"
