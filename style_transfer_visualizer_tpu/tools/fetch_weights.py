"""One-command pretrained-weights bootstrap: fetch, verify, convert.

The reference gets IMAGENET1K_V1 VGG19 weights implicitly through
torchvision's hub download (core_model.py:103-117). This framework has
no torchvision dependency, so ``stv-fetch-weights`` makes the
acquisition explicit: download the torchvision checkpoint (stdlib
urllib — works on any networked machine), verify the SHA-256 prefix
torchvision embeds in the filename, convert to this framework's
``.npz`` cache via :func:`convert_torch_state_dict`, and report where
everything landed. On an air-gapped machine, run this on a connected
host and copy either artifact over (see the verify skill).
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import tempfile
import urllib.error
import urllib.request
from pathlib import Path

from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.arch import VGG19, get_architecture
from style_transfer_visualizer_tpu.utils.logging import logger

#: torchvision's IMAGENET1K_V1 VGG19 checkpoint (the reference's
#: weights, core_model.py:103-117). The ``dcbb9e9d`` filename infix is
#: the SHA-256 prefix torchvision verifies on download; we check it too.
#: Other model families carry their own URL in models.arch
#: (``Architecture.checkpoint_url``); select with --model.
WEIGHTS_URL = VGG19.checkpoint_url

_HEX_DIGITS = set("0123456789abcdef")


def _expected_sha_prefix(url: str) -> str | None:
    """SHA-256 prefix embedded in a torch-hub checkpoint filename.

    torchvision names checkpoints ``<model>-<8+ hex>.pth`` and verifies
    the digest prefix on download; mirror that for whatever URL was
    given instead of hardwiring the default checkpoint's prefix (a
    ``--url`` override must not fail verification against the wrong
    hash). Returns None when the filename carries no hash to check.
    """
    stem = Path(url).stem
    _, _, suffix = stem.rpartition("-")
    if len(suffix) >= 8 and set(suffix) <= _HEX_DIGITS:
        return suffix
    return None


def _download(url: str, dest: Path) -> None:
    """Stream ``url`` to ``dest`` atomically (temp file + rename)."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    digest = hashlib.sha256()
    with tempfile.NamedTemporaryFile(
        dir=dest.parent, delete=False, suffix=".part",
    ) as tmp:
        tmp_path = Path(tmp.name)
        try:
            with urllib.request.urlopen(url) as response:  # noqa: S310
                while chunk := response.read(1 << 20):
                    digest.update(chunk)
                    tmp.write(chunk)
        except BaseException:
            tmp_path.unlink(missing_ok=True)
            raise
    expected = _expected_sha_prefix(url)
    if expected is None:
        logger.warning(
            "Checkpoint filename %s carries no hash suffix; skipping "
            "integrity verification.", Path(url).name,
        )
    elif not digest.hexdigest().startswith(expected):
        tmp_path.unlink(missing_ok=True)
        msg = (
            f"Downloaded checkpoint hash {digest.hexdigest()[:8]} does "
            f"not match the expected prefix {expected}"
        )
        raise RuntimeError(msg)
    tmp_path.replace(dest)


def main(argv: list[str] | None = None) -> int:
    """Fetch + convert pretrained VGG19 weights; 0 on success."""
    parser = argparse.ArgumentParser(
        prog="stv-fetch-weights",
        description=(
            "Download the torchvision VGG19 checkpoint, verify it, and "
            "convert it into the framework's .npz weight cache."
        ),
    )
    parser.add_argument(
        "--model", choices=["vgg19", "vgg16"], default="vgg19",
        help="Which backbone's weights to fetch (default: vgg19)",
    )
    parser.add_argument(
        "--url", default=None,
        help=(
            "Checkpoint URL (default: the selected model's torchvision "
            "IMAGENET1K_V1 checkpoint)"
        ),
    )
    parser.add_argument(
        "--checkpoint-dir",
        default=str(Path.home() / ".cache" / "torch" / "hub" / "checkpoints"),
        help="Where the .pth checkpoint is stored (torch hub layout)",
    )
    parser.add_argument(
        "--cache-dir", default=None,
        help="Converted .npz destination dir (default: the runtime cache)",
    )
    parser.add_argument(
        "--force", action="store_true",
        help="Re-download and re-convert even when artifacts exist",
    )
    args = parser.parse_args(argv)

    arch = get_architecture(args.model)
    url = args.url or arch.checkpoint_url
    cache_dir = (
        Path(args.cache_dir) if args.cache_dir else vgg19._DEFAULT_CACHE_DIR  # noqa: SLF001
    )
    cache_path = cache_dir / arch.cache_filename
    if cache_path.exists() and not args.force:
        logger.info("Converted weights already cached at %s", cache_path)
        return 0

    checkpoint = Path(args.checkpoint_dir) / Path(url).name
    if not checkpoint.exists() or args.force:
        logger.info("Downloading %s -> %s", url, checkpoint)
        try:
            _download(url, checkpoint)
        except (urllib.error.URLError, OSError, RuntimeError) as exc:
            logger.error(
                "Download failed (%s). On an air-gapped machine, run "
                "stv-fetch-weights on a connected host and copy %s or "
                "%s over.",
                exc, checkpoint, cache_path,
            )
            return 1
    else:
        logger.info("Using existing checkpoint at %s", checkpoint)

    params = vgg19._convert_checkpoint(checkpoint, arch)  # noqa: SLF001
    vgg19.save_params_npz(params, cache_path)
    logger.info("Converted weights cached at %s", cache_path)
    logger.info(
        "Done. Runs no longer need --allow-random-weights; "
        "`pytest tests/test_pretrained_weights.py -m slow` now certifies "
        "a real-weights trajectory.",
    )
    return 0


def entrypoint() -> None:  # pragma: no cover - console-script shim
    """Console-script entry."""
    sys.exit(main())


if __name__ == "__main__":  # pragma: no cover
    entrypoint()
