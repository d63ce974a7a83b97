"""Lattice dump / load in the reference's text formats, plus fast paths.

Two reference formats are supported:

  * "hex"  — one line per row, one hex digit (0/1) per spin in full-lattice
    column order; what the optimized tier's dumpLattice writes
    (optimized/main.cu:1140-1209: per row it emits the black/white 4-bit
    fields interleaved by row parity, which is exactly full-lattice order).
    Reloadable with `load_lattice` — unlike the reference, whose dumps are
    write-only (SURVEY.md §5: utils.c Fread is never called).
  * "txt"  — space-separated -1/1 integers, one row per line; what the basic
    tiers write (basic_cuda/main.cu:93-130, basic_python write_lattice).

If the native C++ codec (ising_tpu.native) is built, encoding/decoding of
the hex format uses it; otherwise a NumPy fallback is used.
"""

from __future__ import annotations

import numpy as np

from .lattice import bits_to_spins, compact_to_full, full_to_compact


def _native_codec():
    try:
        from .native import codec
        return codec
    except Exception:
        return None


def full_bits_host(black, white) -> np.ndarray:
    """Device compact planes -> host full {0,1} uint8 lattice."""
    return np.asarray(compact_to_full(black, white), dtype=np.uint8)


def dump_lattice(path: str, black, white, fmt: str = "hex") -> None:
    full = full_bits_host(black, white)
    codec = _native_codec()
    if fmt == "hex":
        if codec is not None:
            codec.write_hex(path, full)
            return
        # '0'/'1' ascii per spin
        chars = full + ord("0")
        with open(path, "wb") as f:
            for row in chars:
                f.write(row.tobytes())
                f.write(b"\n")
    elif fmt == "txt":
        spins = 2 * full.astype(np.int8) - 1
        np.savetxt(path, spins, fmt="%d")
    else:
        raise ValueError(f"unknown dump format {fmt!r}")


def load_lattice(path: str, fmt: str = "hex"):
    """Load a dump back into compact (black, white) uint8 bit planes."""
    if fmt == "hex":
        codec = _native_codec()
        if codec is not None:
            full = codec.read_hex(path)
        else:
            rows = []
            with open(path, "rb") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rows.append(np.frombuffer(line, np.uint8) - ord("0"))
            full = np.stack(rows)
    elif fmt == "txt":
        spins = np.loadtxt(path, dtype=np.int8)
        full = ((spins + 1) // 2).astype(np.uint8)
    else:
        raise ValueError(f"unknown dump format {fmt!r}")
    import jax.numpy as jnp
    return full_to_compact(jnp.asarray(full))


def lattice_image(black, white) -> np.ndarray:
    """Full +-1 spin array for plotting (replaces the reference plotters'
    manual de-interleave, basic_python/plot_ising_multi.py:5-19)."""
    return np.asarray(bits_to_spins(compact_to_full(black, white)))
