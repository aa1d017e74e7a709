"""A/B matmul precision on the flagship BAMP point: HIGHEST (6-pass) vs
HIGH (manual 3-pass bf16, `fused_bamp.dot3`) inside the whole-decode
kernel.  Unlike VAMP, BAMP's per-trial allclose early stop is
load-bearing (meanT 11 vs cap 100 at 8 dB): plain bf16 (1-pass) was
measured to break it (meanT -> cap).  The question is whether the ~2e-17
relative error of the 3-pass form stays below the 1e-5 stop tolerance.

PASS criteria: meanT within ~2% of HIGHEST and FER within binomial CI.

Usage: timeout 2400 python scripts/profile_bamp_precision.py [res] [alphabet]
"""
from __future__ import annotations

import sys
import time

from amp_sparc_spatialmodulation_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from amp_sparc_spatialmodulation_tpu.config import (  # noqa: E402
    flagship_bamp_ook)
from amp_sparc_spatialmodulation_tpu.models import montecarlo  # noqa: E402
from amp_sparc_spatialmodulation_tpu.utils.metrics import (  # noqa: E402
    fetch_sums)

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
ALPHABET = sys.argv[2] if len(sys.argv) > 2 else "OOK"
BATCHES = 4
REPS = 3

cfg = flagship_bamp_ook()
if ALPHABET != "OOK":
    cfg = cfg.replace(alphabet=ALPHABET)
ebn0 = 8.0
snr = jnp.asarray(10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10),
                  jnp.float32)
base = jax.random.PRNGKey(0)
print(f"platform={jax.default_backend()} res={RES} "
      f"alphabet={ALPHABET}", flush=True)

for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH):
    fn = montecarlo.make_realization_fn(
        cfg, "bamp", "sparc", RES, operator_form="banded",
        use_pallas=True, precision=prec)
    step = jax.jit(fn)
    t0 = time.perf_counter()
    fetch_sums(step(jax.random.fold_in(base, 999), snr))
    print(f"prec={prec.name}: compile {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = stats = None
    for r in range(REPS):
        t0 = time.perf_counter()
        tot = {"trials": 0, "T": 0.0, "fer": 0.0}
        for i in range(BATCHES):
            out = fetch_sums(step(jax.random.fold_in(base, i), snr))
            tot["trials"] += int(out["trials"])
            tot["T"] += out["T"]
            tot["fer"] += out["fer"]
        dt = time.perf_counter() - t0
        tps = tot["trials"] / dt
        if best is None or tps > best:
            best, stats = tps, tot
    print(f"  -> {best:.1f} trials/s meanT="
          f"{stats['T']/stats['trials']:.3f} "
          f"FER={stats['fer']/stats['trials']:.4e}", flush=True)
