"""Single simulation config shared by every backend and the CLI.

Replaces the reference's four separate getopt/argparse blocks
(optimized/main.cu:1286-1478, basic_cuda/main.cu:190-238,
basic_python/ising_basic.py:42-64, tensorcore/main.cu:402-451) with one
validated dataclass. Geometry constraints are backend-derived, mirroring the
reference's tile-math checks (optimized/main.cu:1412-1421).
"""

from __future__ import annotations

import dataclasses
import json

from .constants import ALPHA_DEF, SEED_DEF, SPINS_PER_WORD, TCRIT


@dataclasses.dataclass(frozen=True)
class SimConfig:
    # Geometry: Y rows x X columns of the full lattice (both colors).
    nrows: int = 2048
    ncols: int = 2048

    # Temperature: explicit `temp` wins, else alpha * TCRIT (reference -t/-a,
    # optimized/main.cu:1465-1471).
    temp: float | None = None
    alpha: float | None = None

    seed: int = SEED_DEF

    # Update backend: "xla" | "dense" (Pallas int8) | "packed" (Pallas 4-bit)
    # | "mxu" (matmul neighbor sum).
    backend: str = "xla"

    # RNG mode. Counter-based modes are bit-reproducible across backends,
    # shardings and checkpoint/resume: "philox" / "philox7" =
    # Philox4x32-10/-7, "threefry" / "threefry13" = Threefry2x32-20/-13
    # (the reduced-round variants are the BigCrush-validated minima of the
    # Random123 paper — see rng.RNG_MODES). The "...b" variants
    # ("philox7b", "threefry13b", "chacha8b") use the bit-plane contract —
    # 16 bits/spin consumed as plane draws with a bit-serial k-bit
    # compare — still fully reproducible, supported by the bit1 and xla
    # backends; "chacha8b" (multiply-free, 4-wide-ILP ChaCha8 generation)
    # is the fastest crypto-grade reproducible mode (~2x philox7b —
    # PERF.md round 3). "chacha8" is the same generator under the u32
    # contract on ALL five backends (~2x threefry13; needs ncols % 32).
    # "chacha6[b]" / "chacha4[b]" are the statistically-qualified
    # reduced-round speed tiers (multi-GiB consumption-layout battery,
    # docs/rng_battery/ — see rng.RNG_MODES): chacha6b is the recommended
    # fast tier (one double-round of safety margin), chacha4b the
    # minimum-passing maximum-speed tier. "hw" = fastest native generator
    # per backend, no cross-backend contract. Default: threefry13 —
    # reproducible on every backend at ANY even width; pick "chacha8"
    # (any backend) or "chacha6b" (bit1/xla) for speed at real lattice
    # sizes.
    rng: str = "threefry13"

    # Iterations (reference -w / -n).
    nwarmup: int = 0
    niters: int = 1

    # Measurement cadence: fixed every print_freq steps (reference -p) or the
    # exponential 2^(j/4) schedule (reference -e, optimized/main.cu:1211-1228).
    # exp_thinned selects the reference's exact generate_times thinning
    # (>=2x gaps from 152) instead of the denser every-distinct-value series.
    print_freq: int = 0
    print_exp: bool = False
    exp_thinned: bool = False

    # Early exit when |magnetization - tgt_magn| < 1e-3 (reference -m).
    tgt_magn: float | None = None

    # Temperature ramp: temp += temp_step every temp_freq steps, clamped at
    # MIN_TEMP (reference -u STEP,FREQ, optimized/main.cu:1848-1860).
    temp_step: float = 0.0
    temp_freq: int = 0

    # Quenched +-J disorder: probability of an antiferromagnetic link
    # (reference -J, optimized/main.cu:1374-1378). j_seed fixes the
    # disorder REALIZATION independently of `seed` (defaults to `seed`):
    # the standard spin-glass ensemble protocol — and parallel tempering —
    # vary the thermal stream over one frozen set of links.
    j_prob: float | None = None
    j_seed: int | None = None

    # Uniform external field h: H = -sum_<ij> J_ij s_i s_j - h sum_i s_i
    # (beyond the reference, which has no field term). h enters only
    # through host-side acceptance tables, but it breaks the b <-> (4-n)
    # mirror symmetry the 3-threshold kernel paths exploit, so every
    # class carries its own threshold: u32 full-table accept on
    # xla/dense/packed (u32 rng modes), or the 10-class bit-serial accept
    # on bit1 and xla (bit-plane "...b" / hw rng modes) — the flagship
    # tier runs fields at full speed (models/ising.field_kbit_thresholds).
    field: float = 0.0

    # Sub-lattice replica mode: wrap periodically inside xsl x ysl tiles
    # (reference --xsl/--ysl, optimized/main.cu:1423-1463).
    xsl: int | None = None
    ysl: int | None = None

    # Number of devices the rows are sharded over (1-D slab decomposition,
    # the TPU analog of the reference's per-GPU slabs, optimized/main.cu:1627).
    ndev: int = 1

    # Split each sweep into interior + boundary bands so the ppermute halo
    # exchange overlaps interior compute (ndev > 1 only; see
    # parallel/sharded.py). Bit-identical trajectories either way.
    halo_overlap: bool = False

    # Output toggles (reference -o / -c).
    dump_lattice: bool = False
    corr_out: bool = False

    def __post_init__(self):
        if self.nrows <= 0 or self.ncols <= 0:
            raise ValueError("lattice dimensions must be positive")
        if self.ncols % 2:
            raise ValueError("ncols must be even (checkerboard splits rows in half)")
        if self.nrows % 2:
            raise ValueError("nrows must be even (row parity must be periodic)")
        if (self.ncols // 2) % 4:
            raise ValueError("ncols must be a multiple of 8 (Philox quad draws)")
        if self.backend not in ("xla", "dense", "packed", "bit1", "mxu"):
            raise ValueError(f"unknown backend {self.backend!r}")
        from .rng import RNG_MODES
        if self.rng not in RNG_MODES:
            raise ValueError(f"unknown rng mode {self.rng!r}; "
                             f"one of {sorted(RNG_MODES)}")
        if self.rng.startswith("chacha") and (self.ncols // 2) % 16:
            # One ChaCha block yields 16 u32 words; the compact half-row
            # must consume whole blocks (plane modes additionally require
            # the backend's own ncols % 64).
            raise ValueError("chacha rng modes need ncols multiple of 32 "
                             "(16-word ChaCha blocks per compact half-row)")
        if self.backend == "packed":
            # Compact row must fill whole 8-spin words here; on compiled
            # TPU the backend additionally requires ncols % 2048 == 0
            # (128-lane-aligned packed rows — the reference's own X % 2048
            # constraint, optimized/main.cu:1412-1421; see PERF.md). Smaller
            # sizes run in interpreter mode / on CPU.
            if self.ncols % (2 * SPINS_PER_WORD):
                raise ValueError("packed backend needs ncols multiple of 16")
        if self.backend == "bit1" and self.ncols % 64:
            raise ValueError("bit1 backend needs ncols multiple of 64 "
                             "(32 spins per word per color)")
        if self.backend == "mxu" and self.ncols % 256:
            raise ValueError("mxu backend needs ncols multiple of 256")
        if self.nrows % self.ndev:
            raise ValueError("nrows must divide evenly over devices")
        if (self.nrows // self.ndev) % 2:
            raise ValueError("per-device slab height must be even")
        if (self.xsl is None) != (self.ysl is None):
            # Reference derives the missing one from the other; we require both.
            raise ValueError("specify both xsl and ysl or neither")
        if self.xsl is not None:
            if self.ncols % self.xsl or self.xsl % 2:
                raise ValueError("xsl must be even and divide ncols")
            if self.nrows % self.ysl or self.ysl % 2:
                raise ValueError("ysl must be even and divide nrows")
            if (self.nrows // self.ndev) % self.ysl:
                raise ValueError(
                    "ysl must divide the per-device slab height "
                    f"({self.nrows // self.ndev})")
        if self.j_prob is not None and not (0.0 <= self.j_prob <= 1.0):
            raise ValueError("j_prob must be in [0, 1]")
        if self.field != 0.0:
            from .rng import plane_bits
            serial = self.rng == "hw" or plane_bits(self.rng) > 0
            if self.backend == "mxu":
                raise ValueError(
                    "external field is not supported on the mxu backend "
                    "(its 3-threshold accept assumes the h = 0 mirror "
                    "symmetry); use bit1, xla, dense, or packed")
            if self.backend == "bit1" and not serial:
                raise ValueError(
                    "external field on the bit1 backend uses the 10-class "
                    "bit-serial accept: pick a bit-plane rng mode "
                    "(philox7b/threefry13b/chacha8b/...) or hw; u32 "
                    "full-table field runs live on xla/dense/packed")
            if self.backend in ("dense", "packed") and serial:
                raise ValueError(
                    "external field on the dense/packed backends needs a "
                    "u32-contract rng mode (their full-table accepts "
                    "consume u32 draws); bit-plane/hw field runs live on "
                    "bit1 and xla")
            # xla supports every rng mode: u32 full-table compare, or the
            # same 10-class bit-serial accept as bit1 for plane/hw modes.

    @property
    def temperature(self) -> float:
        if self.temp is not None:
            return float(self.temp)
        a = self.alpha if self.alpha is not None else ALPHA_DEF
        return float(a) * TCRIT

    @property
    def local_rows(self) -> int:
        return self.nrows // self.ndev

    @property
    def nspins(self) -> int:
        return self.nrows * self.ncols

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "SimConfig":
        return cls(**json.loads(s))
