"""Device discovery and seeding."""
from __future__ import annotations

import random

import jax
import pytest

from style_transfer_visualizer_tpu.runtime.device import (
    setup_device,
    setup_random_seed,
)


def test_cpu_device(caplog: pytest.LogCaptureFixture) -> None:
    dev = setup_device("cpu")
    assert dev.platform == "cpu"
    assert "Using device" in caplog.text


def test_accelerator_fallback(caplog: pytest.LogCaptureFixture) -> None:
    # Tests run with JAX_PLATFORMS=cpu so tpu/cuda are unavailable.
    dev = setup_device("tpu")
    assert dev.platform == "cpu"
    assert "Falling back to CPU" in caplog.text


def test_cuda_alias_fallback() -> None:
    assert setup_device("cuda").platform == "cpu"


def test_unknown_device() -> None:
    with pytest.raises(ValueError, match="Unknown device"):
        setup_device("quantum")


def test_seed_returns_key_and_seeds_host() -> None:
    key = setup_random_seed(123)
    first = random.random()
    key2 = setup_random_seed(123)
    assert random.random() == first
    a = jax.random.normal(key, (4,))
    b = jax.random.normal(key2, (4,))
    assert (a == b).all()


def test_accelerator_found_path(monkeypatch) -> None:
    """setup_device returns the first device of a present platform."""
    import style_transfer_visualizer_tpu.runtime.device as device_mod

    class FakeDevice:
        platform = "tpu"

        def __repr__(self) -> str:
            return "FakeTpu(id=0)"

    fake = FakeDevice()
    monkeypatch.setattr(
        device_mod.jax, "devices",
        lambda platform=None: [fake],
    )
    assert setup_device("tpu") is fake
