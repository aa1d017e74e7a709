"""Measure the two-phase continuation-batching gain on the SCAMP
massive-MIMO config (Nt=1344, cap 200, T up to ~195 — the slow-tail
workload VERDICT #6 calls out).

Usage: timeout 1800 python scripts/profile_scamp_two_phase.py [ebn0] [res]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import montecarlo
from amp_sparc_spatialmodulation_tpu.utils.cache import (
    enable_persistent_cache)
from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    enable_persistent_cache()
    ebn0 = float(sys.argv[1]) if len(sys.argv) > 1 else 9.0
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = Config(Nt=1344, Na=84, Nr=73, Lin=32, Lh=6, mode="sparc",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=200)
    snr = 10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10)
    snr_dev = jnp.asarray(snr, jnp.float32)
    key = jax.random.PRNGKey(0)
    log(f"platform={jax.default_backend()} ebn0={ebn0} res={res}")

    variants = {
        "single-phase": None,
        "two-phase k1=60": 60,
        "two-phase k1=90": 90,
    }
    for label, k1 in variants.items():
        if k1 is None:
            fn = montecarlo.make_realization_fn(cfg, "scamp", "sparc", res,
                                                operator_form="banded")
            step = jax.jit(fn)

            def run(k):
                return fetch_sums(step(k, snr_dev))
        else:
            fns = montecarlo.make_two_phase_fns(cfg, "scamp", "sparc", res,
                                                k1, operator_form="banded")

            def run(k, fns=fns):
                return fetch_sums(montecarlo.run_two_phase_realization(
                    fns, k, snr_dev))

        t0 = time.perf_counter()
        out = run(jax.random.fold_in(key, 1000))
        log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
        best = None
        for r in range(2):
            t0 = time.perf_counter()
            tot = T = fer = 0.0
            for i in range(2):
                out = run(jax.random.fold_in(key, i))
                tot += out["trials"]
                T += out["T"]
                fer += out["fer"]
            dt = time.perf_counter() - t0
            rep = tot / dt
            log(f"  rep{r}: {rep:.1f} trials/s meanT={T / tot:.1f} "
                f"FER={fer / tot:.3e}")
            best = rep if best is None else max(best, rep)
        log(f"{label}: BEST {best:.1f} trials/s")


if __name__ == "__main__":
    main()
