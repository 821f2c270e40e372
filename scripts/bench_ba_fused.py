"""Fused-Pallas vs XLA BA: device us/iter at L = 4k / 16k / 64k.

VERDICT round-4 item 4: the XLA dense solver streams ~16 MB of Jacobian/
cross-block intermediates through HBM per LM iteration; the fused kernels
(ops/pallas_ba) keep them in VMEM.  This script measures both paths with
the dispatch floor amortized (REPS dependent solves inside one jit) and
prints the before/after table for BASELINE.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ba_fused.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[4096, 16384, 65536])
    ap.add_argument("--iters-lo", type=int, default=20)
    ap.add_argument("--iters-hi", type=int, default=120)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    # precision parity: the Pallas kernels run true-f32 MXU passes
    # (preferred_element_type); pin the XLA path to the same instead of
    # the TPU default (which lowers f32 dots and converges differently)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from jetracer_orbslam2_tpu.config import BAConfig
    from jetracer_orbslam2_tpu.models.backend import ba as ba_core
    from jetracer_orbslam2_tpu.ops import geometry as geo
    from jetracer_orbslam2_tpu.parallel.bench_ba import make_synthetic_ba

    rows = []
    for L in args.sizes:
        prob, intr = make_synthetic_ba(n_poses=8, n_landmarks=L,
                                       obs_per_lm=6)
        P = prob.poses.shape[0]
        obs, _ = ba_core.edges_to_dense(
            P, L, prob.obs_kf, prob.obs_lm, prob.obs_uv, prob.obs_z,
            prob.obs_z_valid, prob.obs_valid)
        poses_cw = jax.vmap(geo.pose_inverse)(prob.poses)
        lm_valid = jnp.ones(L, bool)

        def run(fused, iters, _obs=obs, _pc=poses_cw, _prob=prob,
                _lv=lm_valid):
            cfg = BAConfig(iters=iters)
            f = jax.jit(lambda pc, pts: ba_core.lm_run_dense(
                pc, pts, _obs, _prob.fixed, _lv, intr, cfg, fused=fused))
            out = f(_pc, _prob.points)
            jax.tree.map(np.asarray, out)          # compile + settle
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = f(_pc, _prob.points)
                np.asarray(out[2])
                best = min(best, time.perf_counter() - t0)
            return best, np.asarray(out[2])

        d_it = args.iters_hi - args.iters_lo
        row = {"L": L}
        for name, fused in (("xla", False), ("fused", True)):
            t_lo, tr_lo = run(fused, args.iters_lo)
            t_hi, tr_hi = run(fused, args.iters_hi)
            # slope removes the fixed dispatch + tunnel cost
            row[f"{name}_device_us_per_iter"] = round(
                (t_hi - t_lo) / d_it * 1e6, 1)
            row[f"{name}_total_ms_{args.iters_lo}it"] = round(t_lo * 1e3, 2)
            row[f"{name}_final_cost"] = float(tr_hi[-1])
            if name == "xla":
                tr_x = tr_lo
            else:
                row["traces_match_20it"] = bool(
                    np.allclose(tr_x, tr_lo, rtol=2e-2))
        row["device_speedup"] = round(
            row["xla_device_us_per_iter"]
            / max(row["fused_device_us_per_iter"], 1e-9), 2)
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
