"""Weak-scaling harness: Monte-Carlo trials/s vs trials-axis size.

Fixed per-device work (one realization of ``res`` trials per device per
step); the mesh grows along the ``trials`` axis.  On a multi-chip slice
this measures the BASELINE.json weak-scaling target (>=80% efficiency);
on the CPU host platform (``--cpu N``) it validates the sharded-step
mechanism (virtual devices share one host, so efficiency numbers there
are NOT meaningful).

Usage:
    python scripts/run_scaling.py [--cpu 8] [--res 256] [--steps 4]
"""
from __future__ import annotations

import argparse
import json
import os
import time



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--ebn0", type=float, default=8.0)
    ap.add_argument("--two-phase", type=int, default=0, metavar="K1",
                    help="exercise the composed path (sharded two-phase "
                         "continuation batching + fused kernel)")
    ap.add_argument("--use-pallas", default="auto",
                    choices=["auto", "true", "false"])
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from amp_sparc_spatialmodulation_tpu.config import flagship_bamp_ook
    from amp_sparc_spatialmodulation_tpu.parallel import mesh as mesh_mod
    from amp_sparc_spatialmodulation_tpu.parallel import sweep as psweep

    cfg = flagship_bamp_ook()
    snr = jnp.asarray(10 ** ((args.ebn0 + 10 * np.log10(cfg.code_rate))
                             / 10), jnp.float32)
    devs = jax.devices()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devs)]
    base_key = jax.random.PRNGKey(0)
    rows = []
    use_pallas = (args.use_pallas if args.use_pallas == "auto"
                  else args.use_pallas == "true")
    for d in sizes:
        m = mesh_mod.make_mesh(trials=d, model=1, devices=devs[:d])
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            jnp.arange(d)).reshape(d, 1, 2)
        if args.two_phase:
            fns = psweep.make_sharded_two_phase_fns(
                cfg, "bamp", "sparc", args.res, args.two_phase, m,
                operator_form="banded", use_pallas=use_pallas)
            step = lambda k, s: psweep.run_sharded_two_phase(  # noqa: E731
                fns, k, s, args.res)
        else:
            step = psweep.make_sharded_step(cfg, "bamp", "sparc", args.res,
                                            m, operator_form="banded",
                                            use_pallas=use_pallas)
        out = step(keys, snr)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for s in range(args.steps):
                out = step(keys, snr)
            total = float(out["trials"]) * args.steps
            dt = time.perf_counter() - t0
            best = max(best, total / dt)
        rows.append((d, best, best / d))
        print(f"devices={d:3d}  {best:9.1f} trials/s  "
              f"({best / d:8.1f} per device)", flush=True)
    if len(rows) > 1:
        eff = rows[-1][2] / rows[0][2]
        print(f"weak-scaling efficiency {rows[0][0]}->{rows[-1][0]} "
              f"devices: {eff:.2%}")
    with open("scaling.json", "w") as f:
        json.dump([{"devices": d, "trials_per_s": t, "per_device": p}
                   for d, t, p in rows], f, indent=2)


if __name__ == "__main__":
    main()
