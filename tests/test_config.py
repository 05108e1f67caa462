"""ZelllConfig dataclass (SURVEY §5 config system)."""

import pytest

from zelll_tpu.config import ZelllConfig


def test_defaults_and_roundtrip():
    c = ZelllConfig(cutoff=10.0, precision="split", L=512)
    assert c.to_dict()["L"] == 512
    assert ZelllConfig.from_dict(c.to_dict()) == c


def test_validation():
    with pytest.raises(ValueError):
        ZelllConfig(precision="bf16")
    with pytest.raises(ValueError):
        ZelllConfig(L=100)  # not a 128 multiple
    with pytest.raises(ValueError):
        ZelllConfig(M=1024, L=2048)  # L > M


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("ZELLL_CUTOFF", "2.5")
    monkeypatch.setenv("ZELLL_L", "512")
    monkeypatch.setenv("ZELLL_PRECISION", "split")
    c = ZelllConfig.from_env(M=8192)
    assert c.cutoff == 2.5 and c.L == 512 and c.M == 8192
    assert c.precision == "split"


def test_grown_capacity_class():
    c = ZelllConfig(L=256, M=4096, MAXJ=12, K=32)
    g = c.grown()
    assert g.L == 512 and g.L % 128 == 0
    assert g.M % 1024 == 0 and g.M >= g.L
    assert g.MAXJ == 24 and g.K == 64
    # growing is idempotent in structure (still valid)
    g.grown()
