"""API docs stay in lockstep with the public API."""
import importlib
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
API_DIR = os.path.join(HERE, "docs", "api")
PKG = "pytorch_geometric_signed_directed_tpu"
MODULES = ["nn", "data", "utils", "spectral", "ops", "parallel", "train"]


@pytest.mark.parametrize("modname", MODULES)
def test_every_public_symbol_documented(modname):
    mod = importlib.import_module(f"{PKG}.{modname}")
    path = os.path.join(API_DIR, f"{modname}.md")
    assert os.path.isfile(path), (
        f"missing docs/api/{modname}.md — run scripts/gen_api_docs.py")
    with open(path) as f:
        text = f.read()
    missing = [n for n in mod.__all__ if f"`{n}" not in text]
    assert not missing, (
        f"undocumented public symbols in {modname}: {missing} — "
        f"re-run scripts/gen_api_docs.py")


def test_no_placeholder_docs():
    for modname in MODULES:
        with open(os.path.join(API_DIR, f"{modname}.md")) as f:
            text = f.read()
        assert "(undocumented)" not in text, modname
        assert "Call self as a function" not in text, modname
