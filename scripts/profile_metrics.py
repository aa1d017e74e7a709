"""Bisect evaluate_sums cost on TPU (companion to profile_decompose.py)."""
from __future__ import annotations

import os
import time


from amp_sparc_spatialmodulation_tpu.utils.cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from amp_sparc_spatialmodulation_tpu.config import flagship_bamp_ook  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import channel as channel_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import message as message_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.utils import metrics  # noqa: E402


def timeit(fn, *args, reps=5, inner=3):
    out = fn(*args)
    out = jax.tree_util.tree_map(np.asarray, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = jax.tree_util.tree_map(np.asarray, fn(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    cfg = flagship_bamp_ook()
    res = int(os.environ.get("RES", "8192"))
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.default_backend()} res={res}", flush=True)

    @jax.jit
    def build(key):
        k_msg, k_n = jax.random.split(key)
        msg = message_ops.generate_message(k_msg, cfg, res)
        xmap = msg.x + 0.1 * channel_ops.awgn(
            k_n, cfg, jnp.asarray(10.0, jnp.float32), res
        )[:, :1] * jnp.ones_like(msg.x)
        return msg, xmap

    msg, xmap = build(key)
    T = jnp.full((res,), 11, jnp.int32)

    t = timeit(jax.jit(lambda x: jnp.sum(jnp.abs(x) ** 2)), xmap)
    print(f"floor (abs2 sum over xmap):   {t*1e3:8.2f} ms", flush=True)

    t = timeit(jax.jit(lambda x: metrics.decide(x, cfg).flat.sum()), xmap)
    print(f"decide only:                  {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def nmse_part(xmmse, x):
        d2 = jnp.abs(xmmse - x) ** 2
        d2u = d2.reshape(res, cfg.Lin, cfg.Nt)
        return d2.sum() + d2u[:, 0].sum() + d2u[:, cfg.Lin // 2].sum()

    t = timeit(nmse_part, xmap, msg.x)
    print(f"nmse sums:                    {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def frame_part(x, xhat):
        neq = (xhat != x).reshape(res, cfg.Lin, cfg.Nt)
        err_use = jnp.any(neq, axis=-1)
        return err_use.sum() + jnp.any(err_use, axis=-1).sum()

    t = timeit(frame_part, msg.x, xmap)
    print(f"frame/vector errors:          {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def bits_part(msg):
        dec = metrics.decide(msg.x, cfg)
        ib = int(np.ceil(np.log2(max(cfg.Lin * res * cfg.Na, 2))))
        a = metrics._popcount_masked(dec.flat, msg.flat, ib)
        b = metrics._popcount_masked(dec.gray, msg.gray, cfg.symbol_bits)
        return a + b

    t = timeit(bits_part, msg)
    print(f"decide + popcount bits:       {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def full(xmap, msg, T):
        return metrics.evaluate_sums(xmap, xmap, msg, T, cfg)

    t = timeit(full, xmap, msg, T)
    print(f"full evaluate_sums:           {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
