"""Frame-sequence stylization throughput (BASELINE.json configs[4]).

Drives ``stylize_sequence`` end-to-end on a synthetic clip: N frames of
a drifting gradient stylized against one style image, warm-starting each
frame from the previous result. Reports wall-clock frames/min and the
steady-state optimizer steps/s (frame 0 pays the one-time compile; the
whole clip reuses that executable because content targets are runtime
arguments — sequence.py's compilation discipline).

Also reports the warm-start effect: mean final total loss of frames
1..N-1 vs frame 0 (identical budgets) — warm-started frames end closer
to convergence, which is the point of configs[4].
"""
import json
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

from style_transfer_visualizer_tpu.config import StyleTransferConfig
from style_transfer_visualizer_tpu.sequence import stylize_sequence
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

SIZE = 256
N_FRAMES = 8
STEPS_PER_FRAME = 50


def _make_clip(root: Path) -> tuple[Path, Path]:
    frames_dir = root / "frames"
    frames_dir.mkdir()
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    for i in range(N_FRAMES):
        shift = i / N_FRAMES
        img = np.stack(
            [
                (xx + shift) % 1.0,
                (yy + 0.5 * shift) % 1.0,
                0.5 * np.ones_like(xx),
            ],
            axis=-1,
        )
        Image.fromarray((img * 255).astype(np.uint8)).save(
            frames_dir / f"f{i:02d}.png",
        )
    rng = np.random.default_rng(0)
    style = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
    style_path = root / "style.png"
    Image.fromarray(style).save(style_path)
    return frames_dir, style_path


def main() -> None:
    root = Path(tempfile.mkdtemp(prefix="seq_bench_"))
    frames_dir, style_path = _make_clip(root)
    cfg = StyleTransferConfig.model_validate(
        {
            "optimization": {
                "steps": STEPS_PER_FRAME,
                "optimizer": "adam",
                "lr": 0.05,
                "allow_random_weights": True,
                "init_method": "content",
            },
        },
    )

    start = time.perf_counter()
    result = stylize_sequence(
        frames_dir, style_path, cfg, root / "out",
    )
    wall = time.perf_counter() - start

    # Frame 0 pays the one-time compile; frames 1.. are steady state.
    steady = result.frame_seconds[1:]
    per_frame = sum(steady) / len(steady)
    print(
        json.dumps(
            {
                "metric": "sequence_frames_per_min",
                "n_frames": N_FRAMES,
                "size": SIZE,
                "steps_per_frame": STEPS_PER_FRAME,
                "precision": cfg.hardware.precision,
                "cold_wall_s": round(wall, 1),
                "steady_frame_s": round(per_frame, 3),
                "frames_per_min": round(60 / per_frame, 2),
                "steps_per_sec": round(STEPS_PER_FRAME / per_frame, 2),
                "frame0_final_loss": round(result.frame_losses[0], 3),
                "warm_mean_final_loss": round(
                    sum(result.frame_losses[1:])
                    / len(result.frame_losses[1:]),
                    3,
                ),
            },
        ),
    )


if __name__ == "__main__":
    main()
