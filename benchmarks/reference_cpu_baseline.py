"""Measure the reference pipeline's CPU steps/sec (baseline denominator).

The reference repo depends on torchvision, which is not installed in the
benchmark environment, so this script reconstructs the reference's exact
hot loop in plain torch: the torchvision VGG19 feature stack architecture
(random weights — throughput is weight-independent), the reference's
Gram/MSE loss formulation (clamp 5e5 before normalization,
core_model.py:29-63), and torch.optim.LBFGS with max_iter=1/max_eval=1
(config_defaults.py:12-13) — i.e. exactly one forward+backward per
accepted step, matching the reference's default workload.

Usage: python benchmarks/reference_cpu_baseline.py [size] [steps]
"""
from __future__ import annotations

import sys
import time

import torch
from torch import nn
from torch.nn.functional import mse_loss

VGG19_CFG = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
)
STYLE_LAYERS = (0, 5, 10, 19, 28)
CONTENT_LAYERS = (21,)
CLAMP_MAX = 5e5


def build_vgg19_features() -> nn.Sequential:
    layers: list[nn.Module] = []
    in_ch = 3
    for item in VGG19_CFG:
        if item == "M":
            layers.append(nn.MaxPool2d(2))
        else:
            layers.append(nn.Conv2d(in_ch, int(item), 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = int(item)
    return nn.Sequential(*layers)


def gram(t: torch.Tensor) -> torch.Tensor:
    b, c, h, w = t.shape
    feats = t.reshape(b * c, h * w)
    return torch.mm(feats, feats.t()).clamp(max=CLAMP_MAX) / (b * c * h * w)


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    torch.manual_seed(0)
    vgg = build_vgg19_features().eval()
    for p in vgg.parameters():
        p.requires_grad_(False)
    taps = sorted(set(STYLE_LAYERS) | set(CONTENT_LAYERS))
    last = max(taps)

    def features(x: torch.Tensor) -> dict[int, torch.Tensor]:
        acts = {}
        for i, layer in enumerate(vgg):
            x = layer(x)
            if i in taps:
                acts[i] = x
            if i >= last:
                break
        return acts

    content = torch.rand(1, 3, size, size)
    style = torch.rand(1, 3, size, size)
    with torch.no_grad():
        style_targets = {
            i: gram(a) for i, a in features(style).items()
            if i in STYLE_LAYERS
        }
        content_targets = {
            i: a for i, a in features(content).items()
            if i in CONTENT_LAYERS
        }

    x = torch.randn_like(content).requires_grad_(True)
    opt = torch.optim.LBFGS([x], lr=1.0, max_iter=1, max_eval=1)

    def closure():
        opt.zero_grad()
        acts = features(x)
        s = sum(
            mse_loss(gram(acts[i]), style_targets[i])
            for i in STYLE_LAYERS
        )
        c = sum(
            mse_loss(acts[i], content_targets[i]) for i in CONTENT_LAYERS
        )
        loss = 1e5 * s + 1.0 * c
        loss.backward()
        return loss

    # Warmup
    opt.step(closure)

    start = time.perf_counter()
    for _ in range(steps):
        opt.step(closure)
    elapsed = time.perf_counter() - start
    print(
        f"size={size} steps={steps} elapsed={elapsed:.2f}s "
        f"steps_per_sec={steps / elapsed:.4f}",
    )


if __name__ == "__main__":
    main()
