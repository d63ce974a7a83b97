"""Device mesh construction for slab decomposition.

The reference scales by giving each GPU a contiguous row slab and letting
neighbors read each other's boundary rows through managed memory / IPC
(optimized/main.cu:1602-1658, basic_python/ising_basic.py:211-215). The TPU
analog is a 1-D `jax.sharding.Mesh` over the row axis; boundary rows move as
explicit `ppermute` pushes over ICI (see halo.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

ROW_AXIS = "rows"


def initialize_multihost(**kwargs) -> None:
    """Initialize jax.distributed for multi-host meshes (DCN between hosts).

    The reference has no multi-node story (its IPC halo cannot cross hosts,
    SURVEY.md §4); here multi-host is the same code path — call this before
    make_mesh() on each host and build the mesh over jax.devices().
    """
    import jax

    jax.distributed.initialize(**kwargs)


def make_mesh(ndev: int | None = None, devices=None) -> Mesh:
    """1-D mesh over `ndev` devices (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if ndev is None:
        ndev = len(devices)
    if ndev > len(devices):
        raise ValueError(f"requested {ndev} devices, only {len(devices)} present")
    return Mesh(np.array(devices[:ndev]), (ROW_AXIS,))
