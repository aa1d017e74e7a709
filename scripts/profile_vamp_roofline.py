"""Is a fused Pallas VAMP iteration worth building?  (VERDICT r2 #7)

Measures the VAMP decode's achieved matmul throughput on the flagship
config.  Per iteration the decode is dominated by two (B, N) x (N, p)
complex matmuls in the SV domain (`/root/reference/vamp.py:66-73,84-94`);
if those already run near the f32-HIGHEST MXU roof, a whole-iteration
Pallas kernel has no headroom (the elementwise chain XLA already fuses is
the only other cost) and the honest answer is "don't".

Usage: timeout 900 python scripts/profile_vamp_roofline.py [B] [iters]
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
from amp_sparc_spatialmodulation_tpu.ops import (  # noqa: E402
    channel, message)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 10

cfg = flagship_bamp_ook().replace(iterations=CAP)
key = jax.random.PRNGKey(0)
ebn0 = 8.0
snr = 10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10)
sigma2 = cfg.sigma2(snr)
n, N = cfg.Lout * cfg.Nr, cfg.Lin * cfg.Nt
p = min(n, N)
print(f"platform={jax.default_backend()} B={B} cap={CAP} p={p} N={N}",
      flush=True)


@jax.jit  # everything jitted: eager arrays misbehave through the tunnel
def setup(key):
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    return A, y


A, y = setup(key)


def make_run(cap):
    @jax.jit
    def run(A, y):
        out = vamp.decode(vamp.svd(A), y, sigma2, cfg, iter_cap=cap)
        T = out.T.astype(jnp.float32)
        return jnp.stack([T.mean(), T.max(), jnp.abs(out.xmmse).sum()])

    return run


def timeit(run, label):
    t0 = time.perf_counter()
    stats = np.asarray(run(A, y))
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = None
    for r in range(4):
        t0 = time.perf_counter()
        stats = np.asarray(run(A, y))
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
        print(f"  rep {r}: {dt * 1e3:.1f} ms ({B / dt:.0f} trials/s)",
              flush=True)
    return best, stats


base_t, _ = timeit(make_run(0), "svd-only (iter_cap=0)")
best_full, stats = timeit(make_run(None), f"svd+decode (cap={CAP})")
best = best_full - base_t
print(f"decode-only slice: {best * 1e3:.1f} ms "
      f"(svd/setup {base_t * 1e3:.1f} ms)", flush=True)

meanT = float(stats[0])
# The loop runs max-T iterations over the whole batch (per-trial freeze);
# count the actual executed batch-iterations at the global max.
maxT = float(stats[1])
# 2 complex (B,·)x(N,p) matmuls per iteration, 8 real flops per MAC.
flops_per_iter = 2 * B * N * p * 8
achieved = flops_per_iter * maxT / best
f32_peak = 197e12 / 6
print(f"meanT={meanT:.2f} maxT={maxT:.0f}  matmul {achieved / 1e12:.2f} "
      f"TFLOP/s = {achieved / f32_peak:.1%} of f32-HIGHEST roof")
print("verdict: fused-VAMP headroom = "
      f"{max(0.0, 1 - achieved / f32_peak):.0%} of roof at best; "
      "a Pallas iteration kernel can only reclaim the non-matmul slice.")
