"""Compile-probe the fused VAMP kernel at the flagship geometry: does it
fit VMEM, and what does one decode_call cost?  Much faster feedback than
the full A/B profile when iterating on kernel structure.

Usage: timeout 900 python scripts/probe_vamp_vmem.py [res]
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
from amp_sparc_spatialmodulation_tpu.models import vamp  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import channel  # noqa: E402

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
cfg = flagship_bamp_ook().replace(iterations=100)
print(f"platform={jax.default_backend()} res={RES}", flush=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)


@jax.jit
def setup(k1, k2):
    _, A = channel.generate_as_sparc(k1, cfg)
    dec = vamp.svd(A)
    y = (jax.random.normal(k2, (RES, A.shape[0]), jnp.complex64)
         * jnp.sqrt(0.5))
    return dec, y


dec, y = setup(k1, k2)
s2 = cfg.sigma2(10.0)

step = jax.jit(lambda d, yy: vamp.decode(d, yy, s2, cfg,
                                         use_pallas=True).T)
t0 = time.perf_counter()
try:
    T = np.asarray(step(dec, y))
    print(f"COMPILED+RAN in {time.perf_counter() - t0:.1f}s "
          f"meanT={T.mean():.2f}", flush=True)
    for r in range(3):
        t0 = time.perf_counter()
        T = np.asarray(step(dec, y))
        dt = time.perf_counter() - t0
        print(f"  rep {r}: {RES/dt:.1f} trials/s (decode only)",
              flush=True)
except Exception as e:  # noqa: BLE001
    msg = str(e)
    idx = msg.find("Ran out of memory")
    print("FAILED:", msg[idx:idx + 200] if idx >= 0 else msg[:500])
