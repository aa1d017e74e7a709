"""A/B matmul precision on the flagship VAMP point: HIGHEST (6-pass) vs
HIGH (3-pass bf16) on both the XLA SV-domain path and the fused Pallas
kernel.  VAMP runs at its iteration cap (meanT 99.8/100 at this point),
so the early-stop flutter that makes HIGHEST load-bearing for BAMP is
mostly moot — the question is whether FER statistics survive 3-pass.

Usage: timeout 2400 python scripts/profile_vamp_precision.py [res]
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

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BATCHES = 4
REPS = 2

cfg = flagship_bamp_ook().replace(iterations=100)
ebn0 = 8.0
snr = jnp.asarray(10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10),
                  jnp.float32)
base = jax.random.PRNGKey(0)
print(f"platform={jax.default_backend()} res={RES}", flush=True)

for use_pallas in (False, True):
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH):
        fn = montecarlo.make_realization_fn(
            cfg, "vamp", "sparc", RES, operator_form="dense",
            use_pallas=use_pallas, precision=prec)
        step = jax.jit(fn)
        t0 = time.perf_counter()
        fetch_sums(step(jax.random.fold_in(base, 999), snr))
        print(f"pallas={use_pallas} prec={prec.name}: compile "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
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
