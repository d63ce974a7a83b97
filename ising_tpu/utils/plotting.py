"""Lattice rendering (replaces the reference's three plotters:
basic_cuda/plot_ising.py, basic_python/plot_ising_multi.py,
optimized/plotLattice.py — the last of which is Python 2 only)."""

from __future__ import annotations

import numpy as np


def plot_lattice(source, out_path: str = "lattice.png", dpi: int = 150):
    """Render a lattice to PNG.

    `source` may be (black, white) compact planes, a full +-1 array, or a
    dump file path (hex or txt format auto-detected).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if isinstance(source, str):
        from ..io import load_lattice, lattice_image
        try:
            b, w = load_lattice(source, fmt="hex")
        except Exception:
            b, w = load_lattice(source, fmt="txt")
        img = lattice_image(b, w)
    elif isinstance(source, tuple):
        from ..io import lattice_image
        img = lattice_image(*source)
    else:
        img = np.asarray(source)

    fig, ax = plt.subplots(figsize=(8, 8 * img.shape[0] / img.shape[1]))
    ax.imshow(img, cmap="gray", interpolation="nearest")
    ax.set_axis_off()
    fig.savefig(out_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return out_path
