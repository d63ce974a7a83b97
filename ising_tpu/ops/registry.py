"""Backend registry: one library, swappable update kernels.

The reference ships four sibling programs; here the tiers are four backends
behind one interface (SURVEY.md §7). Each backend exposes:

  encode(black_bits, white_bits) -> storage pair (backend-native layout)
  decode(black_store, white_store) -> uint8 bit planes
  update_color(dst, src, *, color, thr10, step, row0, src_up, src_dn,
               jplanes) -> new dst storage
"""

from __future__ import annotations


def available_backends():
    return ("xla", "dense", "packed", "bit1", "mxu")


def get_backend(cfg):
    if cfg.backend == "xla":
        from .xla_ref import XlaBackend
        return XlaBackend(cfg)
    if cfg.backend == "dense":
        from .pallas_dense import DenseBackend
        return DenseBackend(cfg)
    if cfg.backend == "packed":
        from .pallas_packed import PackedBackend
        return PackedBackend(cfg)
    if cfg.backend == "bit1":
        from .pallas_bit1 import Bit1Backend
        return Bit1Backend(cfg)
    if cfg.backend == "mxu":
        from .mxu import MxuBackend
        return MxuBackend(cfg)
    raise ValueError(f"unknown backend {cfg.backend!r}")
