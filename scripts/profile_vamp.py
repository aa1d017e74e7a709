"""Measure the VAMP/VAMP2 TPU path: trials/s at the converging VAMP OOK
operating point, with the channel SVD amortized over ``res`` trials per
realization (`/root/reference/vamp_model.py:56-58`), plus the standalone
SVD cost so its share is explicit.

Usage:  timeout 900 python scripts/profile_vamp.py [res] [ebn0]
Writes rows for BASELINE.md to stderr.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from amp_sparc_spatialmodulation_tpu.config import flagship_bamp_ook
from amp_sparc_spatialmodulation_tpu.models import montecarlo, vamp
from amp_sparc_spatialmodulation_tpu.ops import channel as channel_ops
from amp_sparc_spatialmodulation_tpu.utils.cache import (
    enable_persistent_cache)
from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    enable_persistent_cache()
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ebn0 = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    cfg = flagship_bamp_ook()        # VAMP OOK uses the same dims
    if len(sys.argv) > 3:            # published VAMP sweeps used cap 10
        import dataclasses
        cfg = dataclasses.replace(cfg, iterations=int(sys.argv[3]))
    snr = 10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10)
    snr_dev = jnp.asarray(snr, jnp.float32)
    log(f"platform={jax.default_backend()} res={res} ebn0={ebn0}")

    # standalone SVD cost of one realization
    key = jax.random.PRNGKey(0)
    _, A = jax.jit(lambda k: channel_ops.generate_as_sparc(k, cfg))(key)
    jax.block_until_ready(A)
    t_svd, _ = timeit(jax.jit(lambda a: vamp.svd(a)), A)
    n, N = A.shape
    log(f"SVD({n}x{N} complex64): {t_svd * 1e3:.1f} ms "
        f"({t_svd / res * 1e6:.1f} us/trial amortized at res={res})")

    for algo in ("vamp", "vamp2"):
        fn = montecarlo.make_realization_fn(cfg, algo, "sparc", res,
                                            operator_form="dense")
        step = jax.jit(fn)
        t0 = time.perf_counter()
        out = fetch_sums(step(jax.random.fold_in(key, 99), snr_dev))
        log(f"{algo}: compile+first {time.perf_counter() - t0:.1f}s")
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            tot_T = tot_trials = fer = 0.0
            for i in range(4):
                out = fetch_sums(step(jax.random.fold_in(key, i), snr_dev))
                tot_T += out["T"]
                tot_trials += out["trials"]
                fer += out["fer"]
            dt = time.perf_counter() - t0
            rep = tot_trials / dt
            log(f"  rep{r}: {rep:.1f} trials/s ({tot_T / dt:.0f} iters/s, "
                f"meanT={tot_T / tot_trials:.2f}, "
                f"FER={fer / tot_trials:.3e})")
            best = rep if best is None else max(best, rep)
        log(f"{algo}: BEST {best:.1f} trials/s")

    # two-phase variant for vamp (continuation batching now algo-generic)
    fns = montecarlo.make_two_phase_fns(cfg, "vamp", "sparc", res, 8,
                                        operator_form="dense")
    t0 = time.perf_counter()
    out = montecarlo.run_two_phase_realization(fns, jax.random.fold_in(
        key, 999), snr_dev)
    log(f"vamp two-phase(k1=8): compile+first {time.perf_counter() - t0:.1f}s")
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        tot = 0.0
        for i in range(4):
            out = fetch_sums(montecarlo.run_two_phase_realization(
                fns, jax.random.fold_in(key, i), snr_dev))
            tot += out["trials"]
        rep = tot / (time.perf_counter() - t0)
        log(f"  rep{r}: {rep:.1f} trials/s")
        best = rep if best is None else max(best, rep)
    log(f"vamp two-phase: BEST {best:.1f} trials/s")


if __name__ == "__main__":
    main()
