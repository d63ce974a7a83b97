"""First-class checkpoint / resume (a capability the reference lacks).

The reference's counter-based RNG makes a run logically resumable from
(lattice, iteration, seed) but it never implements reload (SURVEY.md §5).
Here it is first-class: with the philox rng mode, resuming a checkpoint
continues the *exact* trajectory bit-for-bit, because every future draw is a
pure function of (seed, site, step, color).

Format: a single .npz with bit-packed planes + config JSON + step + current
temperature (temperature may have been ramped since the start).
"""

from __future__ import annotations

import numpy as np

from .config import SimConfig

FORMAT_VERSION = 1


def save_checkpoint(path: str, black, white, *, step: int, temp: float,
                    cfg: SimConfig) -> None:
    b = np.asarray(black, dtype=np.uint8)
    w = np.asarray(white, dtype=np.uint8)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        black=np.packbits(b, axis=1),
        white=np.packbits(w, axis=1),
        shape=np.asarray(b.shape, np.int64),
        step=np.int64(step),
        temp=np.float64(temp),
        config=np.frombuffer(cfg.to_json().encode(), dtype=np.uint8),
    )


def load_checkpoint(path: str):
    """Returns (black, white, step, temp, cfg) with planes as jnp arrays."""
    import jax.numpy as jnp

    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        rows, cols = (int(v) for v in z["shape"])
        black = np.unpackbits(z["black"], axis=1)[:, :cols]
        white = np.unpackbits(z["white"], axis=1)[:, :cols]
        cfg = SimConfig.from_json(bytes(z["config"]).decode())
        if rows != cfg.nrows or cols != cfg.ncols // 2:
            raise ValueError(
                f"checkpoint {path!r} is inconsistent: stored planes are "
                f"{rows}x{cols} but the embedded config says "
                f"{cfg.nrows}x{cfg.ncols // 2} (truncated or edited file?)")
        return (jnp.asarray(black), jnp.asarray(white),
                int(z["step"]), float(z["temp"]), cfg)
