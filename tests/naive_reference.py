"""Independent scalar reference implementation used only by tests.

Deliberately written with plain Python ints and loops (no JAX, no shared
helpers with the library) so it is an honest cross-check of both the Philox
implementation and the checkerboard sweep semantics.
"""

from __future__ import annotations

import numpy as np

M0 = 0xD2511F53
M1 = 0xCD9E8D57
W0 = 0x9E3779B9
W1 = 0xBB67AE85
MASK = 0xFFFFFFFF


def philox4x32_ref(ctr, key, rounds=10):
    """Scalar Philox4x32 on Python ints; ctr is a 4-tuple, key a 2-tuple."""
    c0, c1, c2, c3 = [c & MASK for c in ctr]
    k0, k1 = key[0] & MASK, key[1] & MASK
    for r in range(rounds):
        p0 = (M0 * c0) & 0xFFFFFFFFFFFFFFFF
        p1 = (M1 * c2) & 0xFFFFFFFFFFFFFFFF
        hi0, lo0 = p0 >> 32, p0 & MASK
        hi1, lo1 = p1 >> 32, p1 & MASK
        c0, c1, c2, c3 = (hi1 ^ c1 ^ k0), lo1, (hi0 ^ c3 ^ k1), lo0
        if r != rounds - 1:
            k0 = (k0 + W0) & MASK
            k1 = (k1 + W1) & MASK
    return c0, c1, c2, c3


THREEFRY_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def threefry2x32_ref(c0, c1, k0, k1, rounds=20):
    """Scalar Threefry2x32-R on Python ints (Random123 round structure)."""
    ks0, ks1 = k0 & MASK, k1 & MASK
    ks = (ks0, ks1, ks0 ^ ks1 ^ 0x1BD11BDA)
    x0 = (c0 + ks0) & MASK
    x1 = (c1 + ks1) & MASK
    for r in range(rounds):
        x0 = (x0 + x1) & MASK
        rot = THREEFRY_ROT[r % 8]
        x1 = ((x1 << rot) | (x1 >> (32 - rot))) & MASK
        x1 ^= x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            x0 = (x0 + ks[j % 3]) & MASK
            x1 = (x1 + ks[(j + 1) % 3] + j) & MASK
    return x0, x1


CHACHA_CONST = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
CHACHA_PAD = (0x243F6A88, 0x85A308D3, 0x13198A2E,
              0x03707344, 0xA4093822, 0x299F31D0)

_CHACHA_COLS = ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15))
_CHACHA_DIAGS = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def chacha_ref(c0, c1, step, tag, k0, k1, rounds=8):
    """Scalar ChaCha-R block on Python ints: 16 u32 outputs.

    State layout matches rng.chacha_block: constants | (k0, k1, pads) |
    pads | (c0, c1, step, tag). Rounds alternate column/diagonal patterns;
    feedforward add of the initial state at the end."""
    def rotl(v, n):
        return ((v << n) | (v >> (32 - n))) & MASK

    s = (list(CHACHA_CONST) + [k0 & MASK, k1 & MASK] + list(CHACHA_PAD)
         + [c0 & MASK, c1 & MASK, step & MASK, tag & MASK])
    x = s[:]
    for r in range(rounds):
        for ia, ib, ic, id_ in (_CHACHA_COLS if r % 2 == 0 else _CHACHA_DIAGS):
            a, b, c, d = x[ia], x[ib], x[ic], x[id_]
            a = (a + b) & MASK
            d = rotl(d ^ a, 16)
            c = (c + d) & MASK
            b = rotl(b ^ c, 12)
            a = (a + b) & MASK
            d = rotl(d ^ a, 8)
            c = (c + d) & MASK
            b = rotl(b ^ c, 7)
            x[ia], x[ib], x[ic], x[id_] = a, b, c, d
    return [(xi + si) & MASK for xi, si in zip(x, s)]


RNG_ROUNDS = {"philox": 10, "philox7": 7, "threefry": 20, "threefry13": 13,
              "chacha8": 8}

# Bit-plane-contract modes: (u32-mode equivalent, k bit-planes).
PLANE_MODES = {"philox7b": ("philox7", 16), "threefry13b": ("threefry13", 16),
               "chacha8b": ("chacha8", 16)}


def site_draw(seed, row, col, width, step, tag, mode="philox"):
    """Draw for column `col` of a (rows, width) uint32 draw block.

    For the u32-contract sweep modes width == ch (one draw per compact
    site); the same counter layout serves any block width (init streams,
    bit-plane blocks)."""
    rounds = RNG_ROUNDS[mode]
    if mode.startswith("philox"):
        g = width // 4
        q = row * g + (col % g)
        ctr = (q & MASK, (q >> 32) & MASK, step & MASK, tag & MASK)
        key = (seed & MASK, (seed >> 32) & MASK)
        return philox4x32_ref(ctr, key, rounds)[col // g]
    if mode.startswith("chacha"):
        g = width // 16
        q = row * g + (col % g)
        return chacha_ref(q & MASK, (q >> 32) & MASK, step & MASK,
                          tag & MASK, seed & MASK, (seed >> 32) & MASK,
                          rounds)[col // g]
    # threefry family: 64-bit pair counter under a per-(step, tag) stream
    # key (derived full-strength, matching rng.threefry_stream_key).
    g = width // 2
    q = row * g + (col % g)
    k0, k1 = threefry2x32_ref(step & MASK, tag & MASK,
                              seed & MASK, (seed >> 32) & MASK, 20)
    return threefry2x32_ref(q & MASK, (q >> 32) & MASK, k0, k1,
                            rounds)[col // g]


def site_plane_value(seed, row, col, ch, step, tag, mode):
    """(v, coin_bit) for compact site (row, col) under the bit-plane
    contract: the k-bit uniform v assembled LSB-first from k bit-planes
    (plane z = draw columns [z*W1, (z+1)*W1), W1 = ch/32; the site's bit is
    bit (col // W1) of word (row, z*W1 + col % W1)), plus the plane-0 coin
    bit reused by the greedy dE == 0 class."""
    base, k = PLANE_MODES[mode]
    w1 = ch // 32
    j = col % w1
    g = col // w1
    width = k * w1
    v = 0
    for z in range(k):
        w = site_draw(seed, row, z * w1 + j, width, step, tag, mode=base)
        v |= ((w >> g) & 1) << z
    return v, (site_draw(seed, row, j, width, step, tag, mode=base) >> g) & 1


def kbit_thresholds(temp, k=16):
    """round(p * 2^k) thresholds for the dE = 4 / dE = 8 classes (clipped),
    independent reimplementation of ising.bernoulli_kbit_thresholds."""
    import math
    if temp <= 0:
        return 0, 0
    cap = (1 << k) - 1
    t4 = min(cap, round(min(math.exp(-4.0 / temp), 1.0) * (1 << k)))
    t8 = min(cap, round(min(math.exp(-8.0 / temp), 1.0) * (1 << k)))
    return t4, t8


def field_kbit_table(temp, h, k=16):
    """10-class k-bit accept for plane modes with external field:
    (tvals[b*5+n], always[b*5+n]) — flip iff always or v < t (strict).
    Independent reimplementation of ising.field_kbit_thresholds."""
    import math
    cap = (1 << k) - 1
    tvals, always = [], []
    for b in range(2):
        for n in range(5):
            de = 2.0 * (2 * b - 1) * ((2 * n - 4) + h)
            if temp > 0:
                p = math.exp(-de / temp)
            else:
                p = 1.0 if de < 0 else (0.5 if de == 0 else 0.0)
            always.append(p >= 1.0)
            tvals.append(0 if p >= 1.0 else min(cap, round(p * (1 << k))))
    return tvals, always


def full_compact_col(y, x):
    """Compact column index of full-lattice site (y, x)."""
    return x // 2


def site_color(y, x):
    """0 = black, 1 = white under the storage convention (lattice.py)."""
    # even row: black at even x; odd row: black at odd x.
    return 0 if (x % 2) == (y % 2) else 1


def naive_color_sweep(full_bits, color, thr10, seed, step, *,
                      v=None, h=None, xsl=None, ysl=None, mode="philox",
                      temp=None, field=0.0):
    """Update all sites of `color` in the full {0,1} bit lattice, in place
    semantics (returns a new array). Mirrors basic_cuda/main.cu:54-90 but on
    the full lattice, with optional disorder links and sub-lattice wrap.

    Bit-plane modes (PLANE_MODES) need `temp` to derive the k-bit
    thresholds (the 10-class field table when field != 0); u32 modes use
    the thr10 table (which already carries the field)."""
    Y, X = full_bits.shape
    ch = X // 2
    out = full_bits.copy()
    ysl = ysl or Y
    xsl = xsl or X
    plane = mode in PLANE_MODES
    if plane and field:
        ftvals, falways = field_kbit_table(temp, field,
                                           PLANE_MODES[mode][1])
    elif plane:
        t4k, t8k = kbit_thresholds(temp, PLANE_MODES[mode][1])
        greedy = temp <= 0
    for y in range(Y):
        for x in range(X):
            if site_color(y, x) != color:
                continue
            # periodic neighbors (within sub-lattice tiles)
            y0, x0 = (y // ysl) * ysl, (x // xsl) * xsl
            yu = y0 + (y - y0 - 1) % ysl
            yd = y0 + (y - y0 + 1) % ysl
            xl = x0 + (x - x0 - 1) % xsl
            xr = x0 + (x - x0 + 1) % xsl
            bu = int(full_bits[yu, x])
            bd = int(full_bits[yd, x])
            bl = int(full_bits[y, xl])
            br = int(full_bits[y, xr])
            if v is not None:
                bu ^= int(v[yu, x])   # link (yu,x)-(y,x)
                bd ^= int(v[y, x])    # link (y,x)-(yd,x)
                bl ^= int(h[y, xl])   # link (y,xl)-(y,x)
                br ^= int(h[y, x])    # link (y,x)-(y,xr)
            nsum = bu + bd + bl + br
            b = int(full_bits[y, x])
            if plane:
                e = nsum if b == 1 else 4 - nsum
                val, coin = site_plane_value(
                    seed, y, full_compact_col(y, x), ch, step, tag=color,
                    mode=mode)
                if field:
                    cls = b * 5 + nsum
                    if falways[cls] or val < ftvals[cls]:
                        out[y, x] = b ^ 1
                    continue
                if greedy:
                    flip = (e < 2 or (e == 2 and coin == 1)
                            or (e == 3 and val < t4k)
                            or (e == 4 and val < t8k))
                else:
                    flip = (e < 3 or (e == 3 and val < t4k)
                            or (e == 4 and val < t8k))
                if flip:
                    out[y, x] = b ^ 1
                continue
            r = site_draw(seed, y, full_compact_col(y, x), ch, step,
                          tag=color, mode=mode)
            if r <= int(thr10[b * 5 + nsum]):
                out[y, x] = b ^ 1
    return out


def naive_step(full_bits, thr10, seed, step, **kw):
    """One full MC step: black sweep then white sweep (sequential dependency)."""
    full_bits = naive_color_sweep(full_bits, 0, thr10, seed, step, **kw)
    full_bits = naive_color_sweep(full_bits, 1, thr10, seed, step, **kw)
    return full_bits


def naive_draw_plane(seed, rows, ch, step, tag, mode):
    """(rows, ch) uint32 draw plane, any counter mode (for layout tests)."""
    out = np.zeros((rows, ch), np.uint32)
    for y in range(rows):
        for c in range(ch):
            out[y, c] = site_draw(seed, y, c, ch, step, tag, mode=mode)
    return out


def naive_init(seed, Y, X):
    """Initial bits: top bit of the INIT-stream draw per compact site."""
    full = np.zeros((Y, X), dtype=np.uint8)
    ch = X // 2
    for y in range(Y):
        for x in range(X):
            color = site_color(y, x)
            r = site_draw(seed, y, x // 2, ch, 0, tag=0x100 | color)
            full[y, x] = r >> 31
    return full
