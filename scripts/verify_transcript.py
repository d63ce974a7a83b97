"""Statistical cross-check against the reference's published transcript.

The reference README prints a fixed-seed magnetization trajectory for a
65536^2 lattice at T=1.5, 128 steps, printed every 16 steps
(/root/reference/optimized/README.md:128-139). Bit-exact agreement is
impossible (different RNGs by design); what CAN be checked is that the
reference's trajectory is statistically typical of this framework's
dynamics at the same config: at T < Tc from a random 50/50 init, the
signed magnetization m(t) performs a near-Gaussian zero-mean walk whose
width sigma(t) grows with domain coarsening, and the reference's eight
printed values must sit inside our seed-ensemble band.

Runs N seeds on the current platform (TPU via the axon tunnel), records
m(t) at the same print points, and reports per-point z-scores of the
reference values against our ensemble plus an aggregate chi^2.

Usage: python scripts/verify_transcript.py [--size 65536] [--seeds 8]
           [--backend bit1] [--rng chacha4b] [--out docs/transcript_check.json]
"""
import argparse
import json
import math
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# Reference transcript (optimized/README.md:128-139): signed
# m = (up_s - dw_s) / N at iters 0, 16, ..., 128 for 65536^2, T=1.5.
REF_UP = [2147484090, 2147575418, 2147641872, 2147605659, 2147701147,
          2147558546, 2147471275, 2147612509, 2147678887]
REF_N = 65536 * 65536
REF_M = [(2 * u - REF_N) / REF_N for u in REF_UP]
PRINT_EVERY = 16
NSTEPS = 128


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=65536)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--backend", default="bit1")
    ap.add_argument("--rng", default="chacha4b")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "transcript_check.json"))
    args = ap.parse_args(argv)
    if args.seeds < 2:
        ap.error("--seeds must be >= 2 (the band needs a sample variance)")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    from ising_tpu import SimConfig
    from ising_tpu.driver import Simulation

    L = args.size
    print(f"platform: {jax.devices()[0].platform}  lattice: {L}x{L}  "
          f"backend: {args.backend}/{args.rng}  seeds: {args.seeds}",
          flush=True)

    trajs = []
    for s in range(args.seeds):
        t0 = time.time()
        cfg = SimConfig(nrows=L, ncols=L, temp=1.5, seed=1000 + s,
                        backend=args.backend, rng=args.rng)
        sim = Simulation(cfg)
        traj = []
        for it in range(0, NSTEPS + 1, PRINT_EVERY):
            if it:
                sim.advance(PRINT_EVERY)
            r = sim.measure()
            traj.append((r["up"] - r["down"]) / cfg.nspins)
        trajs.append(traj)
        print(f"seed {1000 + s}: "
              + " ".join(f"{m * 1e6:+7.1f}" for m in traj)
              + f"  (x1e-6, {time.time() - t0:.1f}s)", flush=True)

    npts = NSTEPS // PRINT_EVERY + 1
    n = len(trajs)
    mean = [sum(t[i] for t in trajs) / n for i in range(npts)]
    # Under the h=0 +-m symmetry, m(t) is zero-mean; sigma(t) is set by
    # the coarsening domain statistics and scales as 1/sqrt(area), so an
    # ensemble at OUR size predicts the reference-size band as
    # sigma_ref = sigma_ours * sqrt(N_ours / N_ref).
    area_scale = math.sqrt((args.size * args.size) / REF_N)
    sig_ours, sig_ref = [], []
    for i in range(npts):
        v = sum((t[i] - mean[i]) ** 2 for t in trajs) / max(n - 1, 1)
        sig_ours.append(math.sqrt(v))
        sig_ref.append(math.sqrt(v) * area_scale)

    print("\npoint-by-point: reference value vs our predicted zero-mean "
          "band at 65536^2 (z = ref / sigma_ref); z0 checks our own "
          "ensemble mean against 0:")
    chi2, used = 0.0, 0
    zs = []
    for i in range(npts):
        if sig_ref[i] == 0.0:
            z = 0.0 if abs(REF_M[i]) < 1e-12 else float("inf")
            z0 = 0.0
        else:
            z = REF_M[i] / sig_ref[i]
            z0 = mean[i] / (sig_ours[i] / math.sqrt(n))
        zs.append(z)
        if i:  # iter 0 is the init draw, nearly deterministic m~0
            chi2 += z * z
            used += 1
        print(f"  iter {i * PRINT_EVERY:4d}: ref {REF_M[i] * 1e6:+8.2f}e-6  "
              f"band +-{sig_ref[i] * 1e6:8.2f}e-6   z = {z:+6.2f}   "
              f"(z0 = {z0:+5.2f})", flush=True)

    ok = all(abs(z) < 4.0 for z in zs[1:]) and chi2 < 2.5 * used
    print(f"\nchi^2 / dof = {chi2:.1f} / {used}   "
          f"max |z| = {max(abs(z) for z in zs[1:]):.2f}   "
          f"{'CONSISTENT' if ok else 'INCONSISTENT'}", flush=True)

    out = {"config": vars(args), "platform": jax.devices()[0].platform,
           "ref_m": REF_M, "trajectories": trajs, "mean": mean,
           "sigma_ours": sig_ours, "sigma_ref_pred": sig_ref, "z": zs,
           "chi2": chi2, "dof": used, "consistent": ok}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
