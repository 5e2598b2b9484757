"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, n_pairs: Optional[int] = None
                   ) -> Tuple[int, int]:
    """Pick a (pairs, rows) mesh shape for n_devices.

    If the batch size is known, give the pairs axis min(n_pairs, ...) and use
    the rest for row tiling; otherwise split as square as possible with rows
    getting the larger factor (stencil halos are cheap; warp all-gathers are
    per-row-axis so keep that axis modest)."""
    if n_pairs is not None and n_pairs >= n_devices:
        return (n_devices, 1)
    best = (1, n_devices)
    for p in range(1, n_devices + 1):
        if n_devices % p:
            continue
        r = n_devices // p
        if n_pairs is not None and p > n_pairs:
            break
        if p > r:  # keep rows >= pairs (square-ish, rows gets the larger)
            break
        best = (p, r)
    return best


def make_mesh(n_pairs_axis: int = 1, n_rows_axis: Optional[int] = None,
              devices=None) -> Mesh:
    """Build a ('pairs', 'rows') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_rows_axis is None:
        n_rows_axis = max(1, len(devices) // n_pairs_axis)
    need = n_pairs_axis * n_rows_axis
    if len(devices) < need:
        raise ValueError(
            f"mesh ({n_pairs_axis} pairs x {n_rows_axis} rows) needs {need} "
            f"devices but only {len(devices)} are available — on CPU, set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N")
    arr = np.array(devices[:need]).reshape(n_pairs_axis, n_rows_axis)
    return Mesh(arr, axis_names=("pairs", "rows"))
