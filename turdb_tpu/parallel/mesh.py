"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from turdb_tpu.config import MESH_AXIS_DATA, MESH_AXIS_DB


def make_mesh(
    n_db: int | None = None,
    n_data: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, db) mesh. `db` shards the vector store/graph; `data`
    shards query batches. Defaults to all visible devices on the db axis.

    Axis order puts `data` outermost so db-axis collectives (the top-k
    all-gather merge) ride contiguous ICI neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_db is None:
        n_db = len(devices) // n_data
    assert n_db * n_data <= len(devices), (
        f"need {n_db * n_data} devices, have {len(devices)}"
    )
    grid = np.array(devices[: n_db * n_data]).reshape(n_data, n_db)
    return Mesh(grid, (MESH_AXIS_DATA, MESH_AXIS_DB))
