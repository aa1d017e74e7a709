"""A/B the fused whole-decode SCAMP kernel vs the XLA banded path on the
flagship-dims SCAMP OOK sparc config (`/root/reference/scamp.py:43-59`;
the reference's 10k-trial fine sweep family) at a high-T operating point.

Usage: timeout 900 python scripts/profile_scamp_pallas.py [ebn0] [res] [k1]
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

from amp_sparc_spatialmodulation_tpu.config import Config  # noqa: E402
from amp_sparc_spatialmodulation_tpu.models import montecarlo  # noqa: E402
from amp_sparc_spatialmodulation_tpu.utils.metrics import (  # noqa: E402
    fetch_sums)

EBN0 = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
K1 = int(sys.argv[3]) if len(sys.argv) > 3 else 32
BATCHES = 4
REPS = 3

cfg = Config(Nt=128, Na=8, Nr=24, Lin=20, Lh=3, mode="sparc",
             alphabet="OOK", profile="uniform", trunc="tail",
             iterations=100)
snr = jnp.asarray(10 ** ((EBN0 + 10 * np.log10(cfg.code_rate)) / 10),
                  jnp.float32)
base = jax.random.PRNGKey(0)
print(f"platform={jax.default_backend()} EbN0={EBN0} res={RES} k1={K1}",
      flush=True)

results = {}
for use_pallas in (False, True):
    fns = montecarlo.make_two_phase_fns(cfg, "scamp", "sparc", RES, K1,
                                        operator_form="banded",
                                        use_pallas=use_pallas)
    t0 = time.perf_counter()
    fetch_sums(montecarlo.run_two_phase_realization(
        fns, jax.random.fold_in(base, 999), snr))
    print(f"use_pallas={use_pallas}: compile+first "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    best = stats = None
    for r in range(REPS):
        t0 = time.perf_counter()
        tot = {"trials": 0, "T": 0.0, "fer": 0.0}
        for i in range(BATCHES):
            out = fetch_sums(montecarlo.run_two_phase_realization(
                fns, jax.random.fold_in(base, i), snr))
            tot["trials"] += int(out["trials"])
            tot["T"] += out["T"]
            tot["fer"] += out["fer"]
        dt = time.perf_counter() - t0
        tps = tot["trials"] / dt
        print(f"  rep {r}: {tps:.1f} trials/s "
              f"(meanT={tot['T']/tot['trials']:.2f} "
              f"FER={tot['fer']/tot['trials']:.3e})", flush=True)
        if best is None or tps > best:
            best, stats = tps, tot
    results[use_pallas] = (best, stats)

xla, pal = results[False][0], results[True][0]
sx, sp = results[False][1], results[True][1]
print(f"XLA:    {xla:.1f} trials/s  meanT={sx['T']/sx['trials']:.3f} "
      f"FER={sx['fer']/sx['trials']:.4e}")
print(f"Pallas: {pal:.1f} trials/s  meanT={sp['T']/sp['trials']:.3f} "
      f"FER={sp['fer']/sp['trials']:.4e}")
print(f"speedup: {pal/xla:.2f}x")
