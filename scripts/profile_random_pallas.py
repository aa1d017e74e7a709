"""A/B the whole-decode kernel's Bernoulli-mixture denoiser (random
generator mode, `bamp.py:79-97`) against the XLA banded path.

The reference's committed drivers all run segmented/sparc generators, so
random mode is a capability rather than a published sweep; this measures
whether 'auto' should enable the fused kernel there too.

Usage: timeout 900 python scripts/profile_random_pallas.py [res] [ebn0]
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


def bench_step(step, key, snr_dev, n_batches=8, reps=3):
    best = None
    for r in range(reps):
        t0 = time.perf_counter()
        tot_T = tot = fer = 0.0
        for i in range(n_batches):
            out = fetch_sums(step(jax.random.fold_in(key, i), snr_dev))
            tot_T += out["T"]
            tot += out["trials"]
            fer += out["fer"]
        dt = time.perf_counter() - t0
        rep = dict(tps=tot / dt, ips=tot_T / dt, meanT=tot_T / tot,
                   fer=fer / tot)
        log(f"  rep{r}: {rep['tps']:.1f} trials/s  meanT={rep['meanT']:.2f} "
            f"FER={rep['fer']:.3e}")
        if best is None or rep["tps"] > best["tps"]:
            best = rep
    return best


def main():
    enable_persistent_cache()
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ebn0 = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    # Flagship dims, random generator, Toeplitz (banded-capable) channel.
    cfg = Config(Nt=128, Na=8, Nr=24, Lin=20, Lh=3, B=1, mode="random",
                 alphabet="QPSK", profile="uniform", trunc="tail")
    snr = 10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10)
    snr_dev = jnp.asarray(snr, jnp.float32)
    key = jax.random.PRNGKey(0)
    log(f"platform={jax.default_backend()} res={res} ebn0={ebn0} "
        f"cfg={cfg.name}")

    results = {}
    for use_pallas in (False, True):
        label = "pallas" if use_pallas else "xla"
        try:
            fn = montecarlo.make_realization_fn(
                cfg, "bamp", "toeplitz", res, operator_form="banded",
                use_pallas=use_pallas)
            step = jax.jit(fn)
            t0 = time.perf_counter()
            fetch_sums(step(jax.random.fold_in(key, 1000), snr_dev))
            log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
            results[label] = bench_step(step, key, snr_dev)
            log(f"{label}: BEST {results[label]['tps']:.1f} trials/s")
        except Exception as e:
            log(f"{label}: FAILED {e!r}")
    if len(results) == 2:
        log(f"pallas/xla speedup: "
            f"{results['pallas']['tps'] / results['xla']['tps']:.3f}x")


if __name__ == "__main__":
    main()
