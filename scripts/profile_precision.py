"""A/B matmul precision for BAMP decode: HIGHEST vs HIGH vs DEFAULT.

Speed is only admissible if the T statistic (mean iterations to
convergence) and FER are preserved — DEFAULT (single-pass bf16) was
measured to inflate T ~25%, breaking parity with the reference.
"""
from __future__ import annotations

import os
import time


from amp_sparc_spatialmodulation_tpu.utils.cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from amp_sparc_spatialmodulation_tpu.config import flagship_bamp_ook  # noqa: E402
from amp_sparc_spatialmodulation_tpu.models import bamp  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import channel as channel_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import message as message_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import operators  # noqa: E402
from amp_sparc_spatialmodulation_tpu.utils import metrics  # noqa: E402


def main():
    cfg = flagship_bamp_ook()
    res = int(os.environ.get("RES", "4096"))
    n_real = 3
    snr = jnp.asarray(10 ** ((8.0 + 10 * np.log10(cfg.code_rate)) / 10),
                      jnp.float32)
    print(f"platform={jax.default_backend()} res={res}", flush=True)

    def make_fn(prec):
        @jax.jit
        def run(key, snr):
            k_chan, k_msg, k_noise = jax.random.split(key, 3)
            msg = message_ops.generate_message(k_msg, cfg, res)
            _, A = operators.banded_sparc(k_chan, cfg, precision=prec)
            y = A.apply(msg.x) + channel_ops.awgn(k_noise, cfg, snr, res)
            out = bamp.decode(A, y, cfg.E / snr, cfg, precision=prec)
            s = metrics.evaluate_sums(out.xmap, out.xmmse, msg, out.T, cfg)
            return jnp.stack([jnp.asarray(s[k], jnp.float32)
                              for k in metrics.SUM_KEYS])

        return run

    base = jax.random.PRNGKey(0)
    for name, prec in [("HIGHEST", lax.Precision.HIGHEST),
                       ("HIGH", lax.Precision.HIGH),
                       ("DEFAULT", lax.Precision.DEFAULT)]:
        fn = make_fn(prec)
        _ = np.asarray(fn(jax.random.fold_in(base, 0), snr))  # compile
        best = float("inf")
        acc = None
        for rep in range(3):
            t0 = time.perf_counter()
            tot = np.zeros(len(metrics.SUM_KEYS), np.float32)
            for i in range(n_real):
                tot += np.asarray(fn(jax.random.fold_in(base, i), snr))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            acc = tot
        d = dict(zip(metrics.SUM_KEYS, acc.tolist()))
        n = d["trials"]
        print(f"{name:8s}: {n/best:8.0f} trials/s  meanT={d['T']/n:6.3f}  "
              f"FER={d['fer']/n:.4e}  ser_sum={d['ser']:.0f}", flush=True)


if __name__ == "__main__":
    main()
