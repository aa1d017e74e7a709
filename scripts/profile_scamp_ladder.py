"""SCAMP res/k1 ladder at the flagship-dims OOK sparc point (VERDICT r4
item 6): give SCAMP the round-4 treatment VAMP got — whole-decode kernel
+ two-phase continuation batching (fused phase23, in-graph compaction)
measured over a res ladder with k1 near the point's mean T.

Published point: SCAMP OOK sparc Nt=128 Na=8 Nr=24 Lh=3 Lin=20 at
Eb/N0 = 8 dB -> FER 9.5e-3, T = 6.6 (BASELINE.md), so k1 defaults to 8.

Usage: timeout 3000 python scripts/profile_scamp_ladder.py [k1] [res ...]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    k1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ress = [int(a) for a in sys.argv[2:]] or [2048, 8192, 32768]
    cfg = Config(Nt=128, Na=8, Nr=24, Lin=20, Lh=3, mode="sparc",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=100)
    ebn0 = 8.0
    snr = jnp.asarray(10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10),
                      jnp.float32)
    base = jax.random.PRNGKey(0)
    log(f"platform={jax.default_backend()} k1={k1} ress={ress}")
    for res in ress:
        fns = montecarlo.make_two_phase_fns(
            cfg, "scamp", "sparc", res, k1, operator_form="banded",
            use_pallas="auto")
        t0 = time.perf_counter()
        out = fetch_sums(montecarlo.run_two_phase_realization(
            fns, jax.random.fold_in(base, 999), snr))
        log(f"res={res}: compile+first {time.perf_counter() - t0:.1f}s "
            f"meanT={out['T'] / out['trials']:.2f} "
            f"fer={out['fer'] / out['trials']:.3e}")
        import os
        hint = {}
        if os.environ.get("SCAMP_HINT", "1") not in ("0", "false"):
            # seed the phase123 bucket hint, then measure the
            # deferred-fetch single-program path
            fetch_sums(montecarlo.run_two_phase_realization(
                fns, jax.random.fold_in(base, 998), snr, hint=hint))
            log(f"res={res}: hint bucket={hint.get('bucket')}")
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            if hint.get("bucket"):
                keys = [jax.random.fold_in(base, 8 * r + i)
                        for i in range(4)]
                out = montecarlo.run_two_phase_batches(fns, keys, snr,
                                                       hint)
                tot = out["trials"]
            else:
                tot = 0.0
                for i in range(4):
                    out = fetch_sums(montecarlo.run_two_phase_realization(
                        fns, jax.random.fold_in(base, 8 * r + i), snr))
                    tot += out["trials"]
            tps = tot / (time.perf_counter() - t0)
            log(f"  res={res} rep{r}: {tps:.1f} trials/s")
            best = tps if best is None or tps > best else best
        log(f"res={res} BEST: {best:.1f} trials/s")


if __name__ == "__main__":
    main()
