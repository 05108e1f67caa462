"""The shipped type stub (zelll_tpu/api.pyi) must track the real API —
the analogue of the reference's typed contract
(/root/reference/python/zelll.pyi:1-22). CI additionally runs mypy on
the public surface; this test pins name-level consistency without a
mypy install."""

import ast
import pathlib

import pytest

import zelll_tpu.api as api

pytestmark = pytest.mark.fast

STUB = pathlib.Path(api.__file__).with_suffix(".pyi")


def _stub_members():
    tree = ast.parse(STUB.read_text())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            out[node.name] = {
                n.name for n in node.body if isinstance(n, ast.FunctionDef)
            }
    return out


def test_py_typed_marker_shipped():
    assert (pathlib.Path(api.__file__).parent / "py.typed").exists()


@pytest.mark.parametrize("cls", ["CellGrid", "GridCell"])
def test_stub_members_exist_and_cover(cls):
    stub = _stub_members()
    assert cls in stub
    real = getattr(api, cls)
    # every stubbed member exists on the class
    for name in stub[cls]:
        assert hasattr(real, name), f"{cls}.{name} stubbed but missing"
    # every public member (and the pickle/iter dunders we promise) is
    # stubbed
    public = {
        n for n, v in vars(real).items()
        if callable(v) or isinstance(v, property)
        if not n.startswith("_")
        or n in ("__init__", "__iter__", "__len__", "__repr__",
                 "__getstate__", "__setstate__")
    }
    missing = public - stub[cls] - {"positions", "grid_data", "index"}
    # properties are stubbed as properties; ast sees them as functions
    props = {
        n for n, v in vars(real).items() if isinstance(v, property)
    }
    missing -= props
    assert not missing, f"{cls} members missing from api.pyi: {missing}"
