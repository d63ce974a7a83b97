"""Compiled-TPU Swendsen-Wang gate: tiled Pallas labeler vs CPU ground truth.

The interpret-mode tests (tests/test_cluster.py) prove the tiled
labeler's MATH; only a compiled run can catch a Mosaic miscompile — the
same philosophy as scripts/verify_tpu.py for the Metropolis kernels.
Each case advances the same SW trajectory twice from the same seed:

  * device under test: sw_step's default TPU path (Pallas VMEM labeler,
    label_clusters_tiled) compiled on the chip;
  * ground truth: sw_step with tiled=False on the host CPU device (pure
    XLA roll stencil — itself union-find-verified in the test suite).

Trajectories must be BIT-IDENTICAL (same min-label fixpoint => same
root-keyed coins => same flips). Covers Tc and ordered-phase bond
densities, a ty=8 small-sublane tile shape, the stencil fallback for
un-tileable widths, and the ghost-spin field path.

Run: python scripts/verify_cluster_tpu.py  (~2 min warm)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from ising_tpu.cluster import bond_threshold, sw_step
    from ising_tpu.lattice import compact_to_full, init_bits
    from ising_tpu.constants import TCRIT

    plat = jax.devices()[0].platform
    print(f"verify_cluster_tpu: compiled platform = {plat} "
          f"(ground truth = tiled=False on host cpu)", flush=True)
    if plat == "cpu":
        print("  WARNING: no accelerator found; this cannot catch "
              "Mosaic miscompiles.", flush=True)
    cpu = jax.devices("cpu")[0]

    cases = [
        dict(Y=512, X=512, temp=TCRIT, steps=4),
        dict(Y=1024, X=1024, temp=1.5, steps=3),
        # 1048 rows -> ty=8 tiles (below int8's native 32-sublane tile)
        dict(Y=1048, X=512, temp=TCRIT, steps=3),
        # un-tileable width -> compiled stencil fallback inside sw_step
        dict(Y=256, X=192, temp=TCRIT, steps=3),
        # ghost-spin field: scatter-max + gather on top of the labeler
        dict(Y=512, X=512, temp=2.0, steps=3, field=0.75),
    ]
    ok = True
    for c in cases:
        Y, X, temp, steps = c["Y"], c["X"], c["temp"], c["steps"]
        field = c.get("field", 0.0)
        seed = 20260819
        thr = jnp.uint32(bond_threshold(temp))
        thr_g = jnp.uint32(bond_threshold(temp, abs(field)))
        full0 = jnp.asarray(compact_to_full(*init_bits(seed, Y, X)))

        t0 = time.time()
        f_tpu = jax.jit(lambda f, s: sw_step(
            f, thr, seed, s, field=field, thr_ghost=thr_g))
        ft = full0
        for s in range(steps):
            ft = f_tpu(ft, jnp.uint32(s))
        ft = np.asarray(jax.device_get(ft))
        t_tpu = time.time() - t0

        t0 = time.time()
        with jax.default_device(cpu):
            fc = jax.device_put(full0, cpu)
            for s in range(steps):
                fc = sw_step(fc, thr, seed, jnp.uint32(s), field=field,
                             thr_ghost=thr_g, tiled=False)
            fc = np.asarray(jax.device_get(fc))
        t_cpu = time.time() - t0

        diffs = int((ft != fc).sum())
        tag = f"{Y}x{X} T={temp:g} {steps} SW updates"
        if field:
            tag += f" h={field}"
        status = "OK " if diffs == 0 else "FAIL"
        ok &= diffs == 0
        print(f"  [{status}] {tag}: {diffs} differing sites "
              f"(tpu {t_tpu:.1f}s, cpu ground truth {t_cpu:.1f}s)",
              flush=True)
    print("verify_cluster_tpu: " + ("ALL BIT-EXACT" if ok else "FAILURES"),
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
