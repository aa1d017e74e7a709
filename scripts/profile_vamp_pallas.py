"""A/B the fused whole-decode VAMP kernel vs the XLA SV-domain path on the
flagship-dims VAMP OOK workload (`/root/reference/vamp.py:56-94`), at both
the published cap-10 sweep setting and the current-code cap-100 setting
(where VAMP runs at the cap and the per-iteration cost dominates).

Usage: timeout 1200 python scripts/profile_vamp_pallas.py [res] [cap]
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
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 100
BATCHES = 4
REPS = 3

cfg = flagship_bamp_ook().replace(iterations=CAP)
ebn0 = 8.0
snr = jnp.asarray(10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10),
                  jnp.float32)
base = jax.random.PRNGKey(0)
print(f"platform={jax.default_backend()} res={RES} cap={CAP}", flush=True)

results = {}
for use_pallas in (False, True):
    fn = montecarlo.make_realization_fn(cfg, "vamp", "sparc", RES,
                                        operator_form="dense",
                                        use_pallas=use_pallas)
    step = jax.jit(fn)
    t0 = time.perf_counter()
    fetch_sums(step(jax.random.fold_in(base, 999), snr))
    print(f"use_pallas={use_pallas}: compile+first "
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
