"""Checkerboard lattice state: compact black/white bit planes.

Storage convention (identical to the reference's, basic_cuda/main.cu:251-252
and SURVEY.md §3.5): the full (Y, X) periodic lattice is split by color
c = (x + y) mod 2 into two compact (Y, X/2) planes.

  even row y:  black[y, j] = s[y, 2j]      white[y, j] = s[y, 2j + 1]
  odd  row y:  black[y, j] = s[y, 2j + 1]  white[y, j] = s[y, 2j]

Spins are stored as bits {0, 1} (physical spin = 2b - 1) in uint8. The packed
backend stores the same logical planes as 4-bit fields in uint32 words.

In-row neighbors of a compact site (y, j) in the *opposite* plane:
one neighbor shares column j ("same"), the other is at j-1 or j+1 ("off"),
selected by (row parity, color):

  black: even row -> off = j-1 (left);  odd row -> off = j+1 (right)
  white: mirrored.

This matches the reference's joff selection (basic_cuda/main.cu:73-79).
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import BLACK, WHITE
from .rng import TAG_INIT, color_draws


def init_bits(seed: int, nrows: int, ncols: int, *, row0: int = 0,
              local_rows: int | None = None):
    """Random 50/50 initial spins for both color planes.

    Equivalent to the reference's init (basic_cuda/main.cu:42-52: spin from
    one uniform draw per site). The bit is the top bit of the site's Philox
    draw on the INIT stream, so initialization is also reproducible across
    backends and shardings (row0/local_rows carve out one shard's rows).
    """
    ch = ncols // 2
    rows = local_rows if local_rows is not None else nrows
    planes = []
    for color in (BLACK, WHITE):
        d = color_draws(seed, rows, ch, step=0, tag=TAG_INIT | color,
                        row0=row0, row_stride=ch)
        planes.append((d >> 31).astype(jnp.uint8))
    return planes[0], planes[1]


def init_store(seed: int, nrows: int, ncols: int, encode,
               chunk_rows: int = 8192):
    """Random initial state directly in backend storage, row-chunked.

    init_bits materializes (rows, ncols/2) uint32 draw planes; at the
    reference's large shapes (65536^2 and up, optimized/README.md:291-295)
    that transient is several GB and OOMs the chip even though the packed/
    bit1 STORAGE fits easily. Since the init stream is counter-based and
    row-indexed, and every backend's encode is row-local, initializing in
    row chunks is bit-identical to the one-shot path (tested) with peak
    transient memory O(chunk_rows * ncols).
    """
    if nrows <= chunk_rows:
        b, w = init_bits(seed, nrows, ncols)
        return encode(b, w)
    if nrows % chunk_rows:
        # keep chunks uniform (and even-height for parity); fall back to
        # the largest even divisor <= chunk_rows (start even so an odd
        # chunk_rows still scans even candidates)
        start = chunk_rows - (chunk_rows % 2)
        chunk_rows = next(c for c in range(start, 1, -2)
                          if nrows % c == 0)
    chunks = [encode(*init_bits(seed, nrows, ncols, row0=r,
                                local_rows=chunk_rows))
              for r in range(0, nrows, chunk_rows)]
    return (jnp.concatenate([c[0] for c in chunks], axis=0),
            jnp.concatenate([c[1] for c in chunks], axis=0))


def compact_to_full(black, white):
    """Merge compact planes into the full (Y, X) lattice of {0,1} bits."""
    nrows, ch = black.shape
    full = jnp.zeros((nrows, 2 * ch), dtype=black.dtype)
    row_odd = (jnp.arange(nrows) % 2).astype(bool)[:, None]
    even_cols_vals = jnp.where(row_odd, white, black)  # s[y, 2j]
    odd_cols_vals = jnp.where(row_odd, black, white)  # s[y, 2j+1]
    full = full.at[:, 0::2].set(even_cols_vals)
    full = full.at[:, 1::2].set(odd_cols_vals)
    return full


def full_to_compact(full):
    """Split a full (Y, X) bit lattice into compact (black, white) planes."""
    nrows = full.shape[0]
    row_odd = (jnp.arange(nrows) % 2).astype(bool)[:, None]
    even_cols = full[:, 0::2]
    odd_cols = full[:, 1::2]
    black = jnp.where(row_odd, odd_cols, even_cols)
    white = jnp.where(row_odd, even_cols, odd_cols)
    return black, white


def bits_to_spins(bits):
    """{0,1} bits -> {-1,+1} int8 spins."""
    return (2 * bits.astype(jnp.int8) - 1).astype(jnp.int8)


def links_to_color_planes(v, h, color: int, v_up=None):
    """Project full-lattice disorder links onto one color's neighbor planes.

    Given v[y,x] (vertical link (y,x)-(y+1,x)) and h[y,x] (horizontal link
    (y,x)-(y,x+1)) this returns four compact (Y, X/2) uint8 planes
    (j_up, j_dn, j_same, j_off) holding the antiferro flag of the link from
    each `color` site to its up / down / same-column / off-column neighbor.
    Both colors project from the same link fields, so the two views are
    consistent by construction (replacing the reference's atomicOr scatter,
    optimized/main.cu:221-331).

    v_up: optional (1, X) halo row holding the v link ABOVE the first row
    (row-slab chunked generation; must start on an even global row so local
    parity equals global). Defaults to the full-lattice periodic roll.
    """
    nrows = v.shape[0]
    row_odd = (jnp.arange(nrows) % 2).astype(bool)[:, None]

    def pick(full_plane):
        even_cols = full_plane[:, 0::2]
        odd_cols = full_plane[:, 1::2]
        if color == BLACK:
            return jnp.where(row_odd, odd_cols, even_cols)
        return jnp.where(row_odd, even_cols, odd_cols)

    j_dn = pick(v)  # link to the row-below neighbor
    v_above = jnp.roll(v, 1, axis=0) if v_up is None \
        else jnp.concatenate([v_up, v[:-1]], axis=0)
    j_up = pick(v_above)  # link (y-1,x)-(y,x)
    h_left = jnp.roll(h, 1, axis=1)  # link (y,x-1)-(y,x)

    # Whether this color's "same-column" in-row neighbor is to the right:
    # black on even rows sits at x=2j, its right neighbor (x+1) is white[j]
    # -> same is right on even rows for black, mirrored for white.
    same_is_right = ~row_odd if color == BLACK else row_odd
    j_right = pick(h)
    j_left = pick(h_left)
    j_same = jnp.where(same_is_right, j_right, j_left)
    j_off = jnp.where(same_is_right, j_left, j_right)
    return j_up, j_dn, j_same, j_off
