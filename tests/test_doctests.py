"""Execute the docstring examples — the analogue of the reference's
doc-tests-as-API-contract (runnable examples incl. should-panic cases,
e.g. src/cellgrid/util.rs:268-286, src/lib.rs:258-268). A docstring
example that stops matching reality fails here instead of rotting."""

import doctest

import numpy as np


def _run(mod, extraglobs=None):
    res = doctest.testmod(
        mod,
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS,
        extraglobs=extraglobs or {},
    )
    assert res.attempted > 0, f"{mod.__name__}: no doctests collected"
    assert res.failed == 0, f"{mod.__name__}: {res.failed} doctest failures"


def test_api_doctests():
    import zelll_tpu.api as api

    _run(api)


def test_geometry_doctests():
    import zelll_tpu.core.geometry as geometry

    if not doctest.DocTestFinder().find(geometry):
        return  # no examples yet; api carries the executable contract
    _run(geometry, extraglobs={"np": np})
