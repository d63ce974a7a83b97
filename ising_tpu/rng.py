"""Counter-based Philox4x32-10 RNG in pure JAX uint32 arithmetic.

Why our own Philox: the reference draws all randomness from cuRAND's
Philox4x32-10 (host API in the basic tiers, basic_cuda/main.cu:243-245; in-kernel
counter-based `curand_init(seed, tid, offset)` in the optimized tier,
optimized/main.cu:620-621). Matching cuRAND bit-for-bit is a non-goal, but the
*property* we must keep is counter-based, order-independent randomness: every
site draw is a pure function of (seed, site, step, color), so

  * all backends (pure-XLA, Pallas dense, Pallas packed, MXU) produce
    bit-identical trajectories from one seed,
  * trajectories are independent of the device count / sharding layout
    (generalizing the reference's --use-common-seed mode,
    basic_python/ising_basic.py:50-52,158-168),
  * checkpoint/resume is exact: state is just (lattice, step, seed).

The implementation uses only 32-bit ops (mul, shift, xor, add), so the very
same functions run under `jit`, inside `shard_map`, and inside Pallas TPU
kernels (which have no 64-bit integer support).

Counter layout
--------------
One Philox call produces four 32-bit draws, used for four sites of the same
row, one in each quarter of the row ("quad"). For a compact color array of
logical shape (rows, cols) [cols = X/2 sites of one color per row], with
g = cols // 4:

  quad index  q  = row * g + (col mod g)   (64-bit, split lo/hi)
  counter        = (q_lo, q_hi, step, tag)
  key            = (seed_lo, seed_hi)
  draw for site (row, col) = philox_output[col div g]

(The slot maps to column *groups*, not interleaved columns, so assembling
the (rows, cols) draw plane is a lane-dimension concatenation — an operation
TPU Mosaic supports natively, unlike a 4-way lane interleave.)

`tag` encodes the stream: bit 0 = color, bits 8.. = stream id (sweep / init /
disorder-init), so streams never collide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Philox4x32 multipliers and Weyl key increments (Salmon et al., SC'11).
PHILOX_M0 = 0xD2511F53
PHILOX_M1 = 0xCD9E8D57
PHILOX_W0 = 0x9E3779B9
PHILOX_W1 = 0xBB67AE85
PHILOX_ROUNDS = 10

# Stream tags (counter word 3). Bit 0 is the checkerboard color.
TAG_SWEEP = 0x000
TAG_INIT = 0x100
TAG_HAMILT = 0x200
TAG_CLUSTER = 0x300  # Swendsen-Wang bond draws / cluster coins (cluster.py)

# rng-mode string -> (family, rounds, plane_bits). The reduced-round
# variants are the minimum round counts the Random123 paper (Salmon et al.,
# SC'11, Table 2) validates against the full BigCrush battery: Philox4x32
# passes at 7 rounds, Threefry2x32 at 13 (the full-strength defaults keep
# the paper's recommended safety margin of +3 / +7 rounds). All counter
# modes share the same counter layout and reproducibility guarantees; fewer
# rounds only buy speed. "hw" is the per-backend native generator (no
# portability contract).
#
# The "b" modes use the BIT-PLANE contract (plane_bits = k = 16): instead
# of one u32 draw per spin, each color phase draws k bit-planes — a
# (rows, k*W1) u32 block under the ordinary counter layout, W1 =
# compact_cols/32, where bit g of word (y, z*W1 + j) is random bit z of the
# spin at compact column g*W1 + j — and accepts iff the assembled k-bit
# uniform v < round(p_class * 2^k) (ising.bernoulli_kbit_thresholds).
# Half the generator volume of the u32 modes at a 2^-17 probability
# granularity; trajectories remain bit-identical across backends, device
# counts and checkpoint/resume, but differ from the u32 modes'.
#
# "chacha8" (u32-draw contract, every backend) and "chacha8b" (bit-plane
# contract, the fastest reproducible mode — ~2x philox7b, measured in
# PERF.md round 3) use the ChaCha generator: 8 rounds is multiply-free
# (Philox's 32x32 mulhi costs ~49 emulated vector ops/word on a VPU with
# no vector mulhi32) AND has four independent quarter-round chains per
# round (Threefry's single serial add-rot-xor chain is latency-bound).
# One 16-word ChaCha block is exactly the 16 plane words of one 32-spin
# word. 8 rounds is the accepted safe reduced-round ChaCha variant (best
# published attacks reach 7 rounds; crypto strength implies statistical
# quality far beyond BigCrush).
# The reduced-round ChaCha tiers ("chacha6[b]", "chacha4[b]") are
# STATISTICALLY QUALIFIED, not cryptographic: the committed battery
# (native/rngtest.cpp via scripts/rng_battery.py, logs in
# docs/rng_battery/) tests multi-GiB streams in the exact consumption
# layout — assembled per-spin k-bit uniforms AND raw plane words — and
# chacha4/6/8 pass everything while chacha2 fails 9/10 tests at p ~ 0
# (the battery's teeth). chacha4b is therefore the minimum-passing speed
# tier, chacha6b the qualified-with-margin recommendation (one double-
# round of headroom, the Salmon-et-al. discipline), chacha8b the
# conservative default among the chacha modes (best published ChaCha
# attacks reach 7 rounds, so 8 is crypto-grade).
RNG_MODES = {
    "philox": ("philox", 10, 0),
    "philox7": ("philox", 7, 0),
    "philox7b": ("philox", 7, 16),
    "threefry": ("threefry", 20, 0),
    "threefry13": ("threefry", 13, 0),
    "threefry13b": ("threefry", 13, 16),
    "chacha8": ("chacha", 8, 0),
    "chacha8b": ("chacha", 8, 16),
    "chacha6": ("chacha", 6, 0),
    "chacha6b": ("chacha", 6, 16),
    "chacha4": ("chacha", 4, 0),
    "chacha4b": ("chacha", 4, 16),
    "hw": ("hw", 0, 0),
}


def parse_rng_mode(mode: str):
    """-> (family, rounds); raises on unknown modes."""
    try:
        return RNG_MODES[mode][:2]
    except KeyError:
        raise ValueError(f"unknown rng mode {mode!r}; "
                         f"one of {sorted(RNG_MODES)}") from None


def plane_bits(mode: str) -> int:
    """k for bit-plane-contract modes ("...b"), 0 for u32-draw modes."""
    try:
        return RNG_MODES[mode][2]
    except KeyError:
        raise ValueError(f"unknown rng mode {mode!r}; "
                         f"one of {sorted(RNG_MODES)}") from None


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def mulhilo32(a, b):
    """Full 32x32 -> 64 bit product as (hi, lo) uint32 pair.

    TPUs (and Pallas) have no 64-bit integer multiply, so the high half is
    assembled from 16-bit partial products. All intermediates fit in uint32.
    """
    a = _u32(a)
    b = _u32(b)
    al = a & 0xFFFF
    ah = a >> 16
    bl = b & 0xFFFF
    bh = b >> 16
    lo = a * b  # wraps mod 2^32
    t = al * bl
    m1 = ah * bl
    m2 = al * bh
    # carry out of bits [16:32) of the full product
    s = (m1 & 0xFFFF) + (m2 & 0xFFFF) + (t >> 16)
    hi = ah * bh + (m1 >> 16) + (m2 >> 16) + (s >> 16)
    return hi, lo


def philox4x32(c0, c1, c2, c3, k0, k1, rounds: int = PHILOX_ROUNDS):
    """Philox4x32 block cipher; returns 4 uint32 draws per counter.

    Inputs may be scalars or arrays (broadcast together). The loop is a
    Python loop over a static round count, so it fully unrolls under tracing.
    """
    c0, c1, c2, c3, k0, k1 = map(_u32, (c0, c1, c2, c3, k0, k1))
    for r in range(rounds):
        hi0, lo0 = mulhilo32(PHILOX_M0, c0)
        hi1, lo1 = mulhilo32(PHILOX_M1, c2)
        c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
        if r != rounds - 1:
            k0 = k0 + _u32(PHILOX_W0)
            k1 = k1 + _u32(PHILOX_W1)
    return c0, c1, c2, c3


def rotl32(x, r: int):
    x = _u32(x)
    return (x << r) | (x >> (32 - r))


THREEFRY_ROT_A = (13, 15, 26, 6)
THREEFRY_ROT_B = (17, 29, 16, 24)


THREEFRY_ROUNDS = 20


def threefry2x32(c0, c1, k0, k1, rounds: int = THREEFRY_ROUNDS):
    """Threefry2x32-R (Salmon et al.): two uint32 draws per 64-bit counter.

    The multiply-free counterpart of Philox — on the TPU VPU (which has no
    vector mulhi32) this costs ~2.5x less than the emulated Philox, while
    keeping the same counter-based guarantees. At rounds=20 it matches
    jax's own threefry_2x32 bit-for-bit (cross-validated in tests).

    Round structure follows Random123's threefry2x32 exactly: an initial
    key injection, then `rounds` mix rounds with a further injection after
    every completed group of four (so e.g. rounds=13 ends on a bare round,
    as Random123's R=13 variant does).
    """
    ks0 = _u32(k0)
    ks1 = _u32(k1)
    ks2 = ks0 ^ ks1 ^ _u32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = _u32(c0) + ks0
    x1 = _u32(c1) + ks1
    rot = THREEFRY_ROT_A + THREEFRY_ROT_B
    for r in range(rounds):
        x0 = x0 + x1
        x1 = rotl32(x1, rot[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + _u32(j)
    return x0, x1


# ChaCha (Bernstein 2008) state constants: "expand 32-byte k", plus
# pi-digit pad words (Blowfish P-array) filling the key lanes our 64-bit
# seed does not cover. Word layout (4x4 state, row-major):
#   [ C0 C1 C2 C3 | k0 k1 P0 P1 | P2 P3 P4 P5 | c0 c1 step tag ]
# i.e. the 64-bit spatial counter and the (step, tag) stream live in the
# standard counter/nonce row, exactly the philox counter discipline.
CHACHA_C = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
CHACHA_PAD = (0x243F6A88, 0x85A308D3, 0x13198A2E,
              0x03707344, 0xA4093822, 0x299F31D0)
CHACHA_ROUNDS = 8


def _chacha_qr(a, b, c, d):
    """ChaCha quarter round (add-rotate-xor, rotations 16/12/8/7)."""
    a = a + b
    d = rotl32(d ^ a, 16)
    c = c + d
    b = rotl32(b ^ c, 12)
    a = a + b
    d = rotl32(d ^ a, 8)
    c = c + d
    b = rotl32(b ^ c, 7)
    return a, b, c, d


def chacha_block(c0, c1, step, tag, k0, k1, rounds: int = CHACHA_ROUNDS):
    """ChaCha-R block function: 16 uint32 outputs per counter.

    `rounds` counts single rounds (column or diagonal), applied as
    column/diagonal pairs — rounds=8 is "ChaCha8" in the literature's
    naming. Only even counts are supported (an odd count would end on a
    half pair; the scalar reference applies rounds singly, so silently
    flooring here would diverge from it). The final feedforward add of the initial state makes the map
    non-invertible per the ChaCha design. Inputs broadcast; all ops are
    32-bit add/xor/rotate, so the same function runs under jit, shard_map
    and inside Pallas TPU kernels.
    """
    if rounds % 2:
        raise ValueError(f"chacha rounds must be even, got {rounds}")
    u = _u32
    init = [u(CHACHA_C[0]), u(CHACHA_C[1]), u(CHACHA_C[2]), u(CHACHA_C[3]),
            u(k0), u(k1),
            u(CHACHA_PAD[0]), u(CHACHA_PAD[1]), u(CHACHA_PAD[2]),
            u(CHACHA_PAD[3]), u(CHACHA_PAD[4]), u(CHACHA_PAD[5]),
            u(c0), u(c1), u(step), u(tag)]
    x = list(init)
    for _ in range(rounds // 2):
        x[0], x[4], x[8], x[12] = _chacha_qr(x[0], x[4], x[8], x[12])
        x[1], x[5], x[9], x[13] = _chacha_qr(x[1], x[5], x[9], x[13])
        x[2], x[6], x[10], x[14] = _chacha_qr(x[2], x[6], x[10], x[14])
        x[3], x[7], x[11], x[15] = _chacha_qr(x[3], x[7], x[11], x[15])
        x[0], x[5], x[10], x[15] = _chacha_qr(x[0], x[5], x[10], x[15])
        x[1], x[6], x[11], x[12] = _chacha_qr(x[1], x[6], x[11], x[12])
        x[2], x[7], x[8], x[13] = _chacha_qr(x[2], x[7], x[8], x[13])
        x[3], x[4], x[9], x[14] = _chacha_qr(x[3], x[4], x[9], x[14])
    return [a + b for a, b in zip(x, init)]


def chacha_color_draws(seed: int, nrows: int, ncols: int, *, step, tag: int,
                       row0=0, row_stride: int | None = None,
                       rounds: int = CHACHA_ROUNDS):
    """Per-site uint32 draws, chacha contract: one block call covers 16
    sites — draw(y, col) = output[col // g] of the counter q = y*(stride)
    + (col mod g), g = cols/16, under the (step, tag) stream words. The
    16-slot lane-group concat mirrors the philox quad scheme."""
    if ncols % 16 != 0:
        raise ValueError("chacha draw width must be a multiple of 16")
    if row_stride is not None and row_stride % 16 != 0:
        # A non-multiple stride would silently floor, giving overlapping
        # counters (duplicate draws) across rows.
        raise ValueError("chacha row_stride must be a multiple of 16")
    g = ncols // 16
    stride = (row_stride if row_stride is not None else ncols) // 16
    y = jax.lax.broadcasted_iota(jnp.uint32, (nrows, g), 0) + _u32(row0)
    q = jax.lax.broadcasted_iota(jnp.uint32, (nrows, g), 1)
    hi, lo = mulhilo32(y, _u32(stride))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    k0, k1 = key_from_seed(seed)
    o = chacha_block(c0, c1, _u32(step), _u32(tag), k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def threefry_stream_key(seed: int, step, tag: int):
    """Per-(step, tag) 64-bit key derived with one scalar Threefry call.

    Keeps the 64-bit per-call counter purely spatial (quad index), with
    stream separation done cryptographically in the key — the same
    fold_in discipline jax.random uses. Always full-strength (20 rounds):
    it runs once per kernel call, so reduced-round modes gain nothing by
    weakening the key derivation.
    """
    k0, k1 = key_from_seed(seed)
    return threefry2x32(_u32(step), _u32(tag), k0, k1)


def threefry_color_draws(seed: int, nrows: int, ncols: int, *, step,
                         tag: int, row0=0, row_stride: int | None = None,
                         rounds: int = THREEFRY_ROUNDS):
    """Per-site uint32 draws, threefry contract: one call covers a PAIR of
    sites (col and col + ncols/2); draw(y, col) = output[col // g] of the
    counter q = y*g + (col mod g), g = cols/2, under the stream key."""
    if ncols % 2 != 0:
        raise ValueError("compact width must be even")
    g = ncols // 2
    stride = (row_stride if row_stride is not None else ncols) // 2
    y = jax.lax.broadcasted_iota(jnp.uint32, (nrows, g), 0) + _u32(row0)
    q = jax.lax.broadcasted_iota(jnp.uint32, (nrows, g), 1)
    hi, lo = mulhilo32(y, _u32(stride))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    k0, k1 = threefry_stream_key(seed, step, tag)
    o0, o1 = threefry2x32(c0, c1, k0, k1, rounds)
    return jnp.concatenate([o0, o1], axis=-1)


def key_from_seed(seed: int):
    """Split a 64-bit seed into the (lo, hi) Philox key pair."""
    seed = int(seed)
    return seed & 0xFFFFFFFF, (seed >> 32) & 0xFFFFFFFF


def quad_counters(nrows: int, nquads: int, *, row0=0, quad0=0, row_stride: int | None = None):
    """Build the 64-bit quad counters (c0=lo, c1=hi) for a (nrows, nquads) tile.

    row_stride is the number of quads per *global* row (so sharded/blocked
    tiles of one global lattice draw from disjoint, layout-independent
    counters). row0/quad0 are the global offsets of this tile and may be
    traced values (e.g. derived from `jax.lax.axis_index` or a Pallas
    `pl.program_id`).
    """
    if row_stride is None:
        row_stride = nquads
    y = jax.lax.broadcasted_iota(jnp.uint32, (nrows, nquads), 0) + _u32(row0)
    q = jax.lax.broadcasted_iota(jnp.uint32, (nrows, nquads), 1) + _u32(quad0)
    hi, lo = mulhilo32(y, _u32(row_stride))
    c0 = lo + q
    carry = (c0 < lo).astype(jnp.uint32)
    c1 = hi + carry
    return c0, c1


def color_draws(seed: int, nrows: int, ncols: int, *, step, tag: int,
                row0=0, row_stride: int | None = None,
                rounds: int = PHILOX_ROUNDS):
    """Per-site uint32 draws for one color's compact (nrows, ncols) tile.

    `step` may be a traced uint32 scalar (loop carry). `tag` is static.
    `ncols` must be a multiple of 4 (quad granularity); `row_stride` is the
    *global* compact row width (defaults to ncols). Rows may be offset
    (sharding) but each call must cover full rows.
    """
    if ncols % 4 != 0:
        raise ValueError(f"compact width must be a multiple of 4, got {ncols}")
    nquads = ncols // 4
    stride = (row_stride if row_stride is not None else ncols) // 4
    c0, c1 = quad_counters(nrows, nquads, row0=row0, row_stride=stride)
    k0, k1 = key_from_seed(seed)
    o = philox4x32(c0, c1, _u32(step), _u32(tag), k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def counter_color_draws(mode: str, seed: int, nrows: int, ncols: int, *,
                        step, tag: int, row0=0,
                        row_stride: int | None = None):
    """Mode-dispatched per-site draws for the non-Pallas backends."""
    family, rounds = parse_rng_mode(mode)
    if family == "philox":
        return color_draws(seed, nrows, ncols, step=step, tag=tag, row0=row0,
                           row_stride=row_stride, rounds=rounds)
    if family == "threefry":
        return threefry_color_draws(seed, nrows, ncols, step=step, tag=tag,
                                    row0=row0, row_stride=row_stride,
                                    rounds=rounds)
    if family == "chacha":
        return chacha_color_draws(seed, nrows, ncols, step=step, tag=tag,
                                  row0=row0, row_stride=row_stride,
                                  rounds=rounds)
    return hw_draws(seed, nrows, ncols, step=step, tag=tag, row0=row0)


def hw_draws(seed: int, nrows: int, ncols: int, *, step, tag: int, row0=0):
    """Fast, non-portable draw path using JAX's built-in PRNG.

    Used by rng mode "hw" where cross-backend/cross-sharding bit-exactness is
    not required (e.g. pure throughput benchmarking of the XLA backend). The
    Pallas backends use the on-chip PRNG (pltpu.prng_random_bits) in this mode.

    row0 (the shard's global row offset, possibly traced) is folded into the
    key so sharded runs draw DISTINCT streams per slab — the xla analog of the
    Pallas hw seeding's `params_ref[0] + i` term (pallas_packed._hw_draw_block);
    without it every slab of a sharded xla/hw run consumed identical draws.
    """
    key = jax.random.key((seed ^ (tag * 0x9E3779B9)) & 0x7FFFFFFF)
    key = jax.random.fold_in(key, step)
    key = jax.random.fold_in(key, row0)
    return jax.random.bits(key, (nrows, ncols), dtype=jnp.uint32)
