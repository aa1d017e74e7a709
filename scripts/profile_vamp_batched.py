"""Measure realization-batched VAMP (one kernel grid over C realizations)
vs the unrolled per-realization kernel loop (VERDICT r4 item 8).

Workload: flagship-dims VAMP OOK at 8 dB, the round-4 production point
(res=2048 was the round-3 operating point; round 4 moved to res ladders —
the batched mode targets exactly the small-res regime where SVD+dispatch
overhead per realization dominates, `models/vamp.py:57-59`).

Usage: timeout 3000 python scripts/profile_vamp_batched.py [res] [C]
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
C = int(sys.argv[2]) if len(sys.argv) > 2 else 4
REPS = 3

cfg = flagship_bamp_ook()
ebn0 = 8.0
snr = jnp.asarray(10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10),
                  jnp.float32)
base = jax.random.PRNGKey(0)
print(f"platform={jax.default_backend()} res={RES} C={C}", flush=True)


def bench(name, step, keyshape):
    t0 = time.perf_counter()
    mk = lambda i: (jax.vmap(lambda j: jax.random.fold_in(base, j))(
        jnp.arange(i * C, (i + 1) * C)) if keyshape == 2
        else jax.random.fold_in(base, i))
    out = fetch_sums(step(mk(99), snr))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
          f"meanT={out['T'] / out['trials']:.2f} "
          f"fer={out['fer'] / out['trials']:.3e}", flush=True)
    best = None
    for r in range(REPS):
        t0 = time.perf_counter()
        tot = 0.0
        for i in range(4):
            out = fetch_sums(step(mk(8 * r + i), snr))
            tot += out["trials"]
        tps = tot / (time.perf_counter() - t0)
        print(f"  {name} rep{r}: {tps:.1f} trials/s", flush=True)
        best = tps if best is None or tps > best else best
    print(f"{name} BEST: {best:.1f} trials/s", flush=True)
    return best


# unrolled per-realization kernel loop (the round-4 behavior)
one = montecarlo.make_realization_fn(cfg, "vamp", "sparc", RES,
                                     operator_form="dense",
                                     use_pallas=True)
unrolled = jax.jit(lambda keys, s: montecarlo.sum_realizations(
    one, keys, s))
b1 = bench("unrolled", unrolled, 2)

# realization-batched kernel (one grid over C realizations)
batched = jax.jit(montecarlo.make_batched_vamp_fn(cfg, "sparc", RES, C))
b2 = bench("batched", batched, 2)
print(f"speedup batched/unrolled: {b2 / b1:.2f}x", flush=True)
