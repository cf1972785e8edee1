"""Device-mesh construction helpers.

Two logical axes (constants.py): ``style`` — data parallelism over
independent style targets; ``space`` — spatial sharding of image rows
for tiled Gram evaluation and halo-exchange convolution. Collectives
ride ICI within the mesh; there is no host-side communication backend
(the reference is single-device, SURVEY §2.3 — these axes are new
TPU-first capabilities).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from style_transfer_visualizer_tpu.constants import (
    MESH_AXIS_SPACE,
    MESH_AXIS_STYLE,
)


def create_mesh(
    n_style: int | None = None,
    n_space: int = 1,
    devices: list[jax.Device] | None = None,
) -> Mesh:
    """Build a (style, space) mesh over the given (or all) devices.

    With ``n_style=None`` the style axis absorbs every device not used
    by ``n_space``.
    """
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_style is None:
        if total % n_space != 0:
            msg = f"{total} devices not divisible by n_space={n_space}"
            raise ValueError(msg)
        n_style = total // n_space
    if n_style * n_space > total:
        msg = (
            f"Mesh {n_style}x{n_space} needs {n_style * n_space} devices, "
            f"have {total}"
        )
        raise ValueError(msg)
    grid = np.asarray(devices[: n_style * n_space]).reshape(
        n_style, n_space,
    )
    return Mesh(grid, (MESH_AXIS_STYLE, MESH_AXIS_SPACE))


def single_device_mesh(device: jax.Device | None = None) -> Mesh:
    """Degenerate 1x1 mesh (keeps code paths uniform on one chip)."""
    device = device or jax.devices()[0]
    return Mesh(
        np.asarray([device]).reshape(1, 1),
        (MESH_AXIS_STYLE, MESH_AXIS_SPACE),
    )
