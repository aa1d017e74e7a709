"""Where does a bench batch spend its time?  decode vs (channel+message
generation + metric evaluation).

Times three jitted variants of one flagship realization (res trials):
  full    — generation + decode + metrics (the bench step)
  nodecode— generation + metrics with iter_cap=0 (decode skipped)
  The difference isolates the decode; if the non-decode slice is a large
  fraction, generation/metrics are the next optimization target.

Usage: timeout 900 python scripts/profile_split.py [res]
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
from amp_sparc_spatialmodulation_tpu.models import (  # noqa: E402
    bamp, montecarlo)
from amp_sparc_spatialmodulation_tpu.ops import (  # noqa: E402
    channel as channel_ops, message as message_ops, operators)
from amp_sparc_spatialmodulation_tpu.utils import metrics  # noqa: E402

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
cfg = flagship_bamp_ook()
ebn0 = 8.0
snr = jnp.asarray(10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10),
                  jnp.float32)
base = jax.random.PRNGKey(0)
print(f"platform={jax.default_backend()} res={RES}", flush=True)

use_pallas = jax.default_backend() == "tpu"


def make(iter_cap):
    def fn(key, snr):
        k_chan, k_msg, k_noise = jax.random.split(key, 3)
        sigma2 = cfg.E / snr
        msg = message_ops.generate_message(k_msg, cfg, RES)
        _, A = operators.banded_sparc(k_chan, cfg)
        y = A.apply(msg.x) + channel_ops.awgn(k_noise, cfg, snr, RES)
        out = bamp.decode(A, y, sigma2, cfg, use_pallas=use_pallas,
                          iter_cap=iter_cap)
        return metrics.evaluate_sums(out.xmap, out.xmmse, msg, out.T, cfg)

    return jax.jit(fn)


def bench(fn, label):
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums
    out = fetch_sums(fn(jax.random.fold_in(base, 99), snr))
    best = None
    for r in range(4):
        t0 = time.perf_counter()
        tot_T = tot = 0.0
        for i in range(8):
            out = fetch_sums(fn(jax.random.fold_in(base, i), snr))
            tot_T += out["T"]
            tot += out["trials"]
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None or dt < best else best
    print(f"{label}: {best * 1e3:.1f} ms/realization "
          f"({RES / best:.0f} trials/s, meanT={tot_T / tot:.2f})",
          flush=True)
    return best


full = bench(make(None), "full (gen+decode+metrics)")
nodec = bench(make(0), "no-decode (gen+metrics)   ")
print(f"decode slice: {(full - nodec) * 1e3:.1f} ms "
      f"({(full - nodec) / full:.0%} of the step); "
      f"non-decode overhead: {nodec / full:.0%}")
