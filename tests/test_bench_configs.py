"""Benchmark configs must resolve identically to the production path.

The round-3 1440p staleness — highres_bench carried a hardcoded
``remat=True`` after the production auto-remat rule moved, silently
under-reporting the 1440p row by 44% for two rounds — is the failure
mode this module pins shut. Every benchmark that claims to measure
"the production path" loads here and is compared, setting by setting,
against what a default CLI run would resolve for the same input
(``main.resolve_single_remat``, ``main._resolve_tile_rows``, the
runner's unconstrained dispatch chunk, and the config defaults).
"""
from __future__ import annotations

import ast
import importlib.util
import sys
from pathlib import Path

import pytest

from style_transfer_visualizer_tpu import config_defaults as d
from style_transfer_visualizer_tpu.config import StyleTransferConfig
from style_transfer_visualizer_tpu.engine.runner import DEFAULT_CHUNK
from style_transfer_visualizer_tpu.main import (
    _auto_remat_batched,
    _resolve_tile_rows,
    resolve_single_remat,
)

BENCH_DIR = Path(__file__).resolve().parent.parent / "benchmarks"
REPO_ROOT = BENCH_DIR.parent


def _load_bench(name: str):
    """Import a benchmark module by file path (benchmarks/ is not a
    package)."""
    spec = importlib.util.spec_from_file_location(
        f"bench_{name}", BENCH_DIR / f"{name}.py",
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = module
    spec.loader.exec_module(module)
    return module


class TestHighresBench:
    def test_sizes_resolve_to_production_settings(self) -> None:
        bench = _load_bench("highres_bench")
        for name, size in bench.CONFIGS.items():
            cfg = bench.production_config(size["h"], size["w"])
            assert cfg["remat"] == resolve_single_remat(
                size["h"], size["w"], 0, requested=False,
            ), name
            assert cfg["k"] == DEFAULT_CHUNK, name

    def test_default_precision_is_pipeline_default(self) -> None:
        """The bench's --precision default must track the config's."""
        bench = _load_bench("highres_bench")
        parser_defaults = _argparse_defaults(bench)
        assert parser_defaults["precision"] == d.DEFAULT_PRECISION


class TestLbfgsBench:
    def test_defaults_are_pipeline_defaults(self) -> None:
        bench = _load_bench("lbfgs_bench")
        defaults = _argparse_defaults(bench)
        assert defaults["precision"] == d.DEFAULT_PRECISION
        assert defaults["history_dtype"] == d.DEFAULT_LBFGS_HISTORY_DTYPE
        assert defaults["direction"] == d.DEFAULT_LBFGS_DIRECTION
        assert defaults["histories"] == str(d.DEFAULT_LBFGS_HISTORY_SIZE)


class TestRootBench:
    def test_chunk_and_precision_track_production(self) -> None:
        """bench.py must carry no hardcoded precision/chunk literals.

        Source-level check (importing bench.py runs the measurement):
        the only precision value passed to build_update_step must be
        the config default, and the chunk must derive from
        DEFAULT_CHUNK.
        """
        src = (REPO_ROOT / "bench.py").read_text()
        assert 'precision="mixed"' not in src
        assert "precision='mixed'" not in src
        assert "d.DEFAULT_PRECISION" in src
        assert "min(DEFAULT_CHUNK, TIMED_STEPS)" in src
        assert "min(25, TIMED_STEPS)" not in src
        # L-BFGS metric must measure the default CLI configuration.
        assert "lbfgs_history_dtype=d.DEFAULT_LBFGS_HISTORY_DTYPE" in src
        assert "lbfgs_direction=d.DEFAULT_LBFGS_DIRECTION" in src


class TestTiled4kBench:
    def test_tile_rows_match_cli_resolution(self) -> None:
        """The 4K bench's auto_tile_rows equals the CLI's resolution."""
        from style_transfer_visualizer_tpu.ops.tiled import (
            auto_tile_rows,
        )

        cfg = StyleTransferConfig.model_validate(
            {"optimization": {"allow_random_weights": True}},
        )
        h, w = 2160, 3840
        taps = tuple(
            set(cfg.optimization.style_layers)
            | set(cfg.optimization.content_layers),
        )
        assert _resolve_tile_rows(cfg, h, w) == auto_tile_rows(h, w, taps)


class TestMultistyleBench:
    def test_batch_remat_default_matches_production(self) -> None:
        """512px x 8 styles on one device stays under the batch
        auto-remat threshold, so the bench's remat=False default is the
        production resolution."""
        assert _auto_remat_batched(512 * 512, 8) is False
        src = (BENCH_DIR / "multistyle_bench.py").read_text()
        assert "k = 25" in src or "DEFAULT_CHUNK" in src


def _argparse_defaults(bench_module) -> dict:
    """Extract add_argument defaults from a bench's main() via AST.

    Calling ``main()`` would run the measurement; the parser defaults
    are literal enough to read statically. Only string literals and
    references to ``d.DEFAULT_*`` constants appear; the latter resolve
    against config_defaults.
    """
    tree = ast.parse(
        (BENCH_DIR / f"{Path(bench_module.__file__).name}").read_text(),
    )
    defaults: dict = {}
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "add_argument"
        ):
            continue
        flag = None
        for arg in node.args:
            if isinstance(arg, ast.Constant) and str(
                arg.value,
            ).startswith("--"):
                flag = str(arg.value).lstrip("-").replace("-", "_")
        for kw in node.keywords:
            if kw.arg != "default" or flag is None:
                continue
            value = kw.value
            if isinstance(value, ast.Constant):
                defaults[flag] = value.value
            elif (
                isinstance(value, ast.Attribute)
                and isinstance(value.value, ast.Name)
                and value.value.id == "d"
            ):
                defaults[flag] = getattr(d, value.attr)
            elif isinstance(value, ast.Call):
                # str(d.DEFAULT_...) pattern
                inner = value.args[0]
                if (
                    isinstance(inner, ast.Attribute)
                    and isinstance(inner.value, ast.Name)
                    and inner.value.id == "d"
                ):
                    defaults[flag] = str(getattr(d, inner.attr))
    return defaults


@pytest.mark.parametrize(
    "name",
    ["highres_bench", "lbfgs_bench", "multistyle_bench",
     "tiled_4k_bench", "coarse_bench", "curve_parity_bench"],
)
def test_bench_modules_import_cleanly(name: str) -> None:
    """Every production-claiming bench at least parses and imports."""
    module = _load_bench(name)
    assert hasattr(module, "main")
