"""The stv-fetch-weights bootstrap tool (network mocked)."""
from __future__ import annotations

import hashlib
import io
import urllib.error
from pathlib import Path

import numpy as np

from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.tools import fetch_weights

_PAYLOAD = b"fake torchvision checkpoint bytes"


class _FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _patch_network(monkeypatch, payload: bytes = _PAYLOAD) -> None:
    monkeypatch.setattr(
        fetch_weights.urllib.request, "urlopen",
        lambda url: _FakeResponse(payload),
    )


def _url_for(payload: bytes = _PAYLOAD) -> str:
    """A torch-hub-style URL whose filename hash matches ``payload``."""
    prefix = hashlib.sha256(payload).hexdigest()[:8]
    return f"https://example.test/models/vgg19-{prefix}.pth"


def _tiny_params():
    return {
        0: {
            "w": np.zeros((3, 3, 3, 4), np.float32),
            "b": np.zeros((4,), np.float32),
        },
    }


def test_cache_hit_short_circuits(tmp_path: Path, monkeypatch) -> None:
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / vgg19.CACHE_FILENAME).write_bytes(b"existing")

    def no_network(url):
        msg = "must not touch the network on a cache hit"
        raise AssertionError(msg)

    monkeypatch.setattr(fetch_weights.urllib.request, "urlopen", no_network)
    rc = fetch_weights.main(["--cache-dir", str(cache)])
    assert rc == 0


def test_download_verify_convert(tmp_path: Path, monkeypatch) -> None:
    _patch_network(monkeypatch)
    monkeypatch.setattr(
        vgg19, "_convert_checkpoint", lambda ckpt, _a=None: _tiny_params(),
    )
    ckpt_dir = tmp_path / "hub"
    cache = tmp_path / "cache"
    url = _url_for()
    rc = fetch_weights.main([
        "--url", url,
        "--checkpoint-dir", str(ckpt_dir), "--cache-dir", str(cache),
    ])
    assert rc == 0
    ckpt = ckpt_dir / Path(url).name
    assert ckpt.read_bytes() == _PAYLOAD
    assert not list(ckpt_dir.glob("*.part"))
    with np.load(cache / vgg19.CACHE_FILENAME) as data:
        assert data["w0"].shape == (3, 3, 3, 4)


def test_url_override_verifies_against_its_own_hash(
    tmp_path: Path, monkeypatch,
) -> None:
    """A --url checkpoint is checked against ITS filename hash, not the
    default checkpoint's — a non-default download must not be rejected
    for failing the wrong hash."""
    payload = b"some other model's bytes"
    _patch_network(monkeypatch, payload)
    monkeypatch.setattr(
        vgg19, "_convert_checkpoint", lambda ckpt, _a=None: _tiny_params(),
    )
    rc = fetch_weights.main([
        "--url", _url_for(payload),
        "--checkpoint-dir", str(tmp_path / "hub"),
        "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 0


def test_hashless_filename_skips_verification(
    tmp_path: Path, monkeypatch, caplog,
) -> None:
    _patch_network(monkeypatch)
    monkeypatch.setattr(
        vgg19, "_convert_checkpoint", lambda ckpt, _a=None: _tiny_params(),
    )
    rc = fetch_weights.main([
        "--url", "https://example.test/models/weights.pth",
        "--checkpoint-dir", str(tmp_path / "hub"),
        "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 0
    assert "skipping integrity verification" in caplog.text


def test_non_hex_suffix_counts_as_hashless(
    tmp_path: Path, monkeypatch, caplog,
) -> None:
    """A dash suffix that isn't hex (e.g. a variant tag) is not a hash."""
    _patch_network(monkeypatch)
    monkeypatch.setattr(
        vgg19, "_convert_checkpoint", lambda ckpt, _a=None: _tiny_params(),
    )
    rc = fetch_weights.main([
        "--url", "https://example.test/models/vgg19-imagenet.pth",
        "--checkpoint-dir", str(tmp_path / "hub"),
        "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 0
    assert "skipping integrity verification" in caplog.text


def test_existing_checkpoint_skips_download(
    tmp_path: Path, monkeypatch,
) -> None:
    ckpt_dir = tmp_path / "hub"
    ckpt_dir.mkdir()
    (ckpt_dir / "vgg19-dcbb9e9d.pth").write_bytes(_PAYLOAD)

    def no_network(url):
        msg = "checkpoint already on disk"
        raise AssertionError(msg)

    monkeypatch.setattr(fetch_weights.urllib.request, "urlopen", no_network)
    monkeypatch.setattr(
        vgg19, "_convert_checkpoint", lambda ckpt, _a=None: _tiny_params(),
    )
    cache = tmp_path / "cache"
    rc = fetch_weights.main([
        "--checkpoint-dir", str(ckpt_dir), "--cache-dir", str(cache),
    ])
    assert rc == 0
    assert (cache / vgg19.CACHE_FILENAME).exists()


def test_hash_mismatch_fails_and_cleans_up(
    tmp_path: Path, monkeypatch,
) -> None:
    # The default URL expects the dcbb9e9d prefix; the fake payload
    # hashes to something else.
    _patch_network(monkeypatch)
    ckpt_dir = tmp_path / "hub"
    rc = fetch_weights.main([
        "--checkpoint-dir", str(ckpt_dir), "--cache-dir", str(tmp_path),
    ])
    assert rc == 1
    assert not list(ckpt_dir.glob("*"))  # no partial artifacts


def test_network_failure_reports_airgap_path(
    tmp_path: Path, monkeypatch, caplog,
) -> None:
    def down(url):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(fetch_weights.urllib.request, "urlopen", down)
    rc = fetch_weights.main([
        "--checkpoint-dir", str(tmp_path / "hub"),
        "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 1
    assert "air-gapped" in caplog.text


def test_default_cache_dir_used_without_flag(
    tmp_path: Path, monkeypatch,
) -> None:
    cache = tmp_path / "default_cache"
    cache.mkdir()
    (cache / vgg19.CACHE_FILENAME).write_bytes(b"existing")
    monkeypatch.setattr(vgg19, "_DEFAULT_CACHE_DIR", cache)
    rc = fetch_weights.main([])
    assert rc == 0
