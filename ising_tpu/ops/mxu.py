"""MXU backend ("mxu"): neighbor sums as banded bf16 matmuls.

TPU-native rebuild of the reference's tensor-core tier (tensorcore/main.cu):
where the reference builds a banded K matrix (1s on the diagonal and first
subdiagonal, set_k at tensorcore/main.cu:48-61) and computes neighbor sums
as batched fp16 cublasGemmBatchedEx calls (:252-262) followed by an
`add_boundaries` fix-up kernel (:148-226) and a Metropolis kernel (:88-146),
here:

  * spins become +-1 bf16 on the compact plane; 128 is both the MXU tile
    size and the block size (the reference's 128x128 sub-block geometry,
    LATTICE_SUB_N at tensorcore/main.cu:38, is exactly the MXU tile);
  * the vertical neighbor sum is one batched einsum with a (128,128)
    K = sub+super-diagonal band over row blocks; the horizontal off-column
    sum is two batched einsums with single-diagonal bands over column
    blocks, selected by row parity;
  * block-boundary rows/columns the band cannot see are added back with
    two-row/two-column updates (the add_boundaries analog, but pure XLA);
  * every product/sum is exact in bf16 (values in [-4, 4]), so the derived
    neighbor counts — and therefore whole trajectories — are bit-identical
    to the xla/dense/packed backends under the shared Philox contract.

Like the reference's tensorcore tier, this backend supports neither quenched
disorder nor sub-lattice replicas (tensorcore/main.cu has no -J/--xsl).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import BLACK
from ..rng import TAG_SWEEP, counter_color_draws

TILE = 128


def _band(n: int, offset: int) -> np.ndarray:
    """(n, n) bf16 matrix with ones on the given diagonal."""
    m = np.zeros((n, n), np.float32)
    idx = np.arange(n - abs(offset))
    if offset >= 0:
        m[idx, idx + offset] = 1.0
    else:
        m[idx - offset, idx] = 1.0
    return m


def neighbor_counts(src, src_up, src_dn, *, color: int):
    """Neighbor bit-count n in 0..4 for every dst-color site, via MXU.

    src: (H, C) uint8 bits of the opposite color; src_up/src_dn: (1, C)
    halo rows. H and C must be multiples of 128.
    """
    H, C = src.shape
    s = (2.0 * src.astype(jnp.bfloat16) - 1.0)  # +-1 spins

    kv = jnp.asarray(_band(TILE, 1) + _band(TILE, -1), jnp.bfloat16)
    # In the "hbj,ji->hbi" orientation: out[i] = sum_j in[j] * k[j, i].
    kl = jnp.asarray(_band(TILE, 1), jnp.bfloat16)   # out[i] = in[i-1]
    kr = jnp.asarray(_band(TILE, -1), jnp.bfloat16)  # out[i] = in[i+1]

    # Vertical: per 128-row block, K @ block gives s[i-1] + s[i+1] with the
    # block-edge rows missing; add them back from neighbor blocks / halos.
    rb = s.reshape(H // TILE, TILE, C)
    v = jnp.einsum("ij,bjc->bic", kv, rb,
                   preferred_element_type=jnp.bfloat16)
    up_rows = jnp.concatenate(
        [2.0 * src_up.astype(jnp.bfloat16) - 1.0, s[TILE - 1::TILE][:-1]])
    dn_rows = jnp.concatenate(
        [s[TILE::TILE], 2.0 * src_dn.astype(jnp.bfloat16) - 1.0])
    v = v.at[:, 0, :].add(up_rows)
    v = v.at[:, TILE - 1, :].add(dn_rows)
    v = v.reshape(H, C)

    # Horizontal: per 128-column block, band products give the left/right
    # compact neighbor; wrap columns across block edges afterwards.
    cb = s.reshape(H, C // TILE, TILE)
    left = jnp.einsum("hbj,ji->hbi", cb, kl,
                      preferred_element_type=jnp.bfloat16)
    right = jnp.einsum("hbj,ji->hbi", cb, kr,
                       preferred_element_type=jnp.bfloat16)
    lcols = jnp.concatenate([s[:, C - 1:C], s[:, TILE - 1::TILE][:, :-1]],
                            axis=1)
    rcols = jnp.concatenate([s[:, TILE::TILE], s[:, 0:1]], axis=1)
    left = left.at[:, :, 0].add(lcols)
    right = right.at[:, :, TILE - 1].add(rcols)
    left = left.reshape(H, C)
    right = right.reshape(H, C)

    row_odd = (jnp.arange(H, dtype=jnp.int32) % 2 == 1)[:, None]
    if color == BLACK:
        off = jnp.where(row_odd, right, left)
    else:
        off = jnp.where(row_odd, left, right)

    total = v + s + off  # sum of 4 neighbor spins, exact in bf16
    return ((total.astype(jnp.int32) + 4) >> 1).astype(jnp.int32)  # n in 0..4


class MxuBackend:
    """Backend adapter: bf16 matmul neighbor sums + shared integer accept."""

    name = "mxu"
    bytes_per_spin = 1.0  # uint8 storage (bf16 staging is transient)

    def __init__(self, cfg):
        if cfg.xsl is not None:
            raise NotImplementedError(
                "mxu backend has no sub-lattice mode (nor does the "
                "reference tensorcore tier)")
        if cfg.j_prob is not None:
            raise NotImplementedError(
                "mxu backend has no disorder mode (nor does the reference "
                "tensorcore tier)")
        if cfg.nrows % TILE or (cfg.ncols // 2) % TILE:
            raise ValueError(
                "mxu backend needs nrows and ncols/2 multiples of 128")
        if cfg.local_rows % TILE:
            raise ValueError(
                f"mxu backend needs the per-device slab height "
                f"({cfg.local_rows} = nrows/ndev) to be a multiple of 128")
        self.cfg = cfg

    def encode(self, black_bits, white_bits):
        return black_bits, white_bits

    def decode(self, black_store, white_store):
        return black_store, white_store

    def update_color(self, dst, src, *, color, thr10, step, row0=0,
                     src_up=None, src_dn=None, jplanes=None):
        assert jplanes is None
        H, C = dst.shape
        n = neighbor_counts(src, src_up, src_dn, color=color)
        draws = counter_color_draws(self.cfg.rng, self.cfg.seed, H, C,
                                    step=step, tag=TAG_SWEEP | color,
                                    row0=row0, row_stride=C)
        from .xla_ref import select_threshold
        thr = select_threshold(dst, n, thr10)
        accept = (draws <= thr).astype(jnp.uint8)
        return dst ^ accept
