"""Boundary-row halo exchange over the device ring.

The reference's halo is *pull-based and implicit*: a GPU's update kernel
dereferences the neighboring slab's boundary row through managed memory / IPC
pointers (optimized/main.cu:1637-1642, basic_python/ising_basic.py:95-96).
On TPU the idiomatic equivalent is an explicit *push*: before each color
sweep, `lax.ppermute` the opposite color's first/last rows around the ring so
every shard holds the two halo rows it needs. Only 2 rows x X/2 bytes move
per color per step, riding ICI.
"""

from __future__ import annotations

import jax.lax as lax


def ring_halo_rows(src, axis_name: str):
    """Return (up_halo, dn_halo), each (1, C): the neighboring shards' edge rows.

    up_halo = last row of the previous shard (global row row0 - 1),
    dn_halo = first row of the next shard (global row row0 + H).
    With a single device both permutes are identity, i.e. periodic wrap.
    """
    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # i sends to i+1
    bwd = [(i, (i - 1) % n) for i in range(n)]   # i sends to i-1
    up_halo = lax.ppermute(src[-1:], axis_name, fwd)
    dn_halo = lax.ppermute(src[:1], axis_name, bwd)
    return up_halo, dn_halo
