"""VGG-family architecture registry (layer tables, defaults, weights).

The reference hardcodes torchvision's VGG19 (core_model.py:103-117).
This framework generalizes the same flat-index layer addressing to the
whole VGG family: an :class:`Architecture` carries the conv/relu/pool
layer table (indices matching ``torchvision.models.<name>().features``),
the model's literature-standard style/content tap defaults, and its
pretrained-checkpoint identity. VGG19 remains the default everywhere;
VGG16 (Johnson et al.'s perceptual-loss backbone) is the first
alternative family.

Two addressing mechanisms, one source of truth:

- Code that has a params pytree in hand derives the table from it
  (:func:`layer_table_from_params`): conv indices are the pytree keys,
  channel widths come from the kernel shapes, and relu/pool positions
  follow from the VGG grammar (every conv is followed by its relu;
  anything else is a pool; the stack ends conv, relu, pool). The
  feature sweep therefore adapts to whatever weights it is handed —
  no global architecture switch to keep consistent.
- Code that runs before weights exist (tiling validators, CLI help)
  looks the table up by name via :data:`ARCHITECTURES`.
"""
from __future__ import annotations

from dataclasses import dataclass, field

# Layer-type tags (canonical home; models.vgg19 re-exports them).
CONV = "conv"
RELU = "relu"
POOL = "pool"

#: (kind, in_channels, out_channels) per torchvision feature index.
LayerTable = tuple[tuple[str, int, int], ...]


def _expand_cfg(cfg: tuple[int | str, ...]) -> LayerTable:
    """Expand a VGG config string into one (kind, in, out) row per index."""
    rows: list[tuple[str, int, int]] = []
    in_ch = 3
    for item in cfg:
        if item == "M":
            rows.append((POOL, in_ch, in_ch))
        else:
            out_ch = int(item)
            rows.append((CONV, in_ch, out_ch))
            rows.append((RELU, out_ch, out_ch))
            in_ch = out_ch
    return tuple(rows)


@dataclass(frozen=True)
class Architecture:
    """A VGG-family feature stack with torchvision-compatible numbering."""

    name: str
    cfg: tuple[int | str, ...]
    #: Literature-standard taps (conv1_1..conv5_1 pre-ReLU for style,
    #: conv4_2 for content — Gatys et al. on VGG19; the same named
    #: layers land on different flat indices per architecture).
    default_style_layers: tuple[int, ...]
    default_content_layers: tuple[int, ...]
    #: Converted-weights cache filename under the framework cache dir.
    cache_filename: str
    #: Torchvision checkpoint filename globs to convert from.
    checkpoint_globs: tuple[str, ...]
    #: Canonical torchvision download URL (used by stv-fetch-weights;
    #: the filename embeds the first 8 sha256 hex chars).
    checkpoint_url: str
    layer_table: LayerTable = field(init=False)
    conv_indices: tuple[int, ...] = field(init=False)
    num_layers: int = field(init=False)

    def __post_init__(self) -> None:
        table = _expand_cfg(self.cfg)
        object.__setattr__(self, "layer_table", table)
        object.__setattr__(
            self,
            "conv_indices",
            tuple(i for i, (k, _, _) in enumerate(table) if k == CONV),
        )
        object.__setattr__(self, "num_layers", len(table))

    def pools_before(self, idx: int) -> int:
        """Number of 2x2 pools crossed at or before layer ``idx``."""
        return pools_before_in(self.layer_table, idx)


def pools_before_in(table: LayerTable, idx: int) -> int:
    """Pools crossed at or before ``idx`` in an explicit layer table.

    Spatial dims at a tap are the input dims divided by
    ``2**pools_before_in(table, idx)`` — load-bearing for Gram/content
    normalization and sharding divisibility checks.
    """
    return sum(
        1 for j, (kind, _, _) in enumerate(table) if j <= idx and kind == POOL
    )


def layer_table_from_params(params) -> LayerTable:
    """Reconstruct the layer table from a params pytree's structure.

    Conv indices are the pytree keys and channel widths come from the
    HWIO kernel shapes; relu/pool positions follow from the VGG grammar
    (a relu immediately follows every conv, anything else is a pool, and
    the stack ends conv, relu, pool). Uses only static structure — safe
    at trace time under ``jit``.
    """
    if not params:
        msg = "Cannot derive a layer table from empty params"
        raise ValueError(msg)
    convs = sorted(params)
    rows: list[tuple[str, int, int]] = []
    for idx in range(convs[-1] + 3):
        if idx in params:
            w = params[idx]["w"]
            rows.append((CONV, int(w.shape[2]), int(w.shape[3])))
        elif idx - 1 in params:
            ch = int(params[idx - 1]["w"].shape[3])
            rows.append((RELU, ch, ch))
        else:
            ch = rows[-1][2] if rows else 3
            rows.append((POOL, ch, ch))
    return tuple(rows)


VGG19 = Architecture(
    name="vgg19",
    cfg=(
        64, 64, "M",
        128, 128, "M",
        256, 256, 256, 256, "M",
        512, 512, 512, 512, "M",
        512, 512, 512, 512, "M",
    ),
    # Reference defaults (config_defaults.py:18-19): conv1_1..conv5_1
    # style, conv4_2 content.
    default_style_layers=(0, 5, 10, 19, 28),
    default_content_layers=(21,),
    cache_filename="vgg19_imagenet.npz",
    checkpoint_globs=("vgg19-*.pth", "vgg19.pth"),
    checkpoint_url="https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
)

VGG16 = Architecture(
    name="vgg16",
    cfg=(
        64, 64, "M",
        128, 128, "M",
        256, 256, 256, "M",
        512, 512, 512, "M",
        512, 512, 512, "M",
    ),
    # The same named taps on VGG16's flat numbering: conv1_1=0,
    # conv2_1=5, conv3_1=10, conv4_1=17, conv5_1=24; content conv4_2=19.
    default_style_layers=(0, 5, 10, 17, 24),
    default_content_layers=(19,),
    cache_filename="vgg16_imagenet.npz",
    checkpoint_globs=("vgg16-*.pth", "vgg16.pth"),
    checkpoint_url="https://download.pytorch.org/models/vgg16-397923af.pth",
)

ARCHITECTURES: dict[str, Architecture] = {a.name: a for a in (VGG19, VGG16)}


def get_architecture(name: str) -> Architecture:
    """Look up an architecture by name with a helpful error."""
    try:
        return ARCHITECTURES[name]
    except KeyError:
        known = ", ".join(sorted(ARCHITECTURES))
        msg = f"Unknown model architecture {name!r}; known: {known}"
        raise ValueError(msg) from None
