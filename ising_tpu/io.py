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


def dump_lattice_streamed(path: str, decode_rows, nrows: int,
                          fmt: str = "hex", row_chunk: int = 8192) -> None:
    """Row-streamed dump: decode_rows(r0, r1) -> (black, white) compact bit
    planes for rows [r0, r1). Writes the same byte-identical formats as
    dump_lattice while holding only one row chunk on the host — the
    single-device analog of the per-shard dump below (the reference
    likewise never gathers more than one GPU's slab, optimized/main.cu:1180).
    """
    if fmt not in ("hex", "txt"):
        raise ValueError(f"unknown dump format {fmt!r}")
    with open(path, "wb") as f:
        for r in range(0, nrows, row_chunk):
            b, w = decode_rows(r, min(nrows, r + row_chunk))
            full = full_bits_host(b, w)
            if fmt == "hex":
                chars = full + ord("0")
                for row in chars:
                    f.write(row.tobytes())
                    f.write(b"\n")
            else:
                spins = 2 * full.astype(np.int8) - 1
                np.savetxt(f, spins, fmt="%d")


# ----------------------------------------------------------------------------
# Per-shard dump / stitching load.
#
# The reference writes one file per GPU (its row slab), OpenMP-parallel over
# devices (optimized/main.cu:1140-1209 at :1180; basic_python writes
# final_rank{k}.txt per MPI rank). Gathering a multi-device lattice into one
# host array before writing hits a host-memory cliff at reference scale
# (524288 x 65536 = 34 GB of bits); dumping each row-slab shard to its own
# file keeps host memory at one slab and parallelizes the encoding.

def _shard_path(path: str, k: int) -> str:
    root, dot, ext = path.rpartition(".")
    return f"{root}_shard{k:04d}.{ext}" if dot else f"{path}_shard{k:04d}"


def _row_start(shard) -> int:
    s = shard.index[0] if shard.index else slice(None)
    return s.start or 0


def dump_lattice_sharded(path: str, black, white, fmt: str = "hex"):
    """Write one file per addressable row-slab shard; returns the paths.

    black/white are compact bit planes (possibly sharded over the row axis).
    Shard k (in row order) goes to `<path>_shard000k.<ext>`; each file is a
    self-contained dump of its slab in the same format dump_lattice writes,
    so existing tooling (plotters, load_lattice) works on individual shards.
    """
    from concurrent.futures import ThreadPoolExecutor

    sb = sorted(black.addressable_shards, key=_row_start)
    ws = {_row_start(s): s for s in white.addressable_shards}

    def write_one(k_shard):
        k, shard = k_shard
        p = _shard_path(path, k)
        dump_lattice(p, shard.data, ws[_row_start(shard)].data, fmt)
        return p

    # Encoding + file IO release the GIL (NumPy/native codec), so threads
    # give real overlap — the analog of the reference's OpenMP loop.
    with ThreadPoolExecutor(max_workers=min(8, len(sb))) as ex:
        return list(ex.map(write_one, enumerate(sb)))


def load_lattice_sharded(path: str, fmt: str = "hex"):
    """Stitch `<path>_shard*.<ext>` files back into compact (black, white)."""
    import glob
    import re

    root, dot, ext = path.rpartition(".")
    pattern = f"{root}_shard*.{ext}" if dot else f"{path}_shard*"
    paths = glob.glob(pattern)
    if not paths:
        raise FileNotFoundError(f"no shard files match {pattern!r}")
    paths.sort(key=lambda p: int(re.search(r"_shard(\d+)", p).group(1)))
    import jax.numpy as jnp
    planes = [load_lattice(p, fmt) for p in paths]
    return (jnp.concatenate([b for b, _ in planes], axis=0),
            jnp.concatenate([w for _, w in planes], axis=0))
