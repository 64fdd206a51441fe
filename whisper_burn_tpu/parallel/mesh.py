"""Device mesh construction for {data, model} parallelism."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None,
    model: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``data=None`` uses all remaining devices after the model axis. The
    model axis is laid out innermost so tensor-parallel collectives ride
    neighboring ICI links; the data axis only communicates at result
    gather time.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
