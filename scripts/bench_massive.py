"""Massive-MIMO BAMP speed ladder (VERDICT r4 item 3).

Re-measures the largest published config (Nt=1344, Na=84, Nr=73, Lh=6,
Lin=32 — `/root/reference/Simulations/BAMP/OOK,segmented/uniform,tail/`)
at the round-4/5 operating discipline: XLA banded operator (the decode
kernel's VMEM tile-fit check excludes this geometry), two-phase
continuation batching with k1 near the point's mean T, bucket-only
evaluation (phase1e/phase23b), over a res ladder.

Protocol matches the round-2 row it replaces: Eb/N0 = 18 dB, cap 300
(the in-place reference re-run converges at T~34 there — the published
T=133 predates the reference's current code, BASELINE.md).

Usage: timeout 3000 python scripts/bench_massive.py [res1 res2 ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from amp_sparc_spatialmodulation_tpu.config import massive_mimo
from amp_sparc_spatialmodulation_tpu.models import montecarlo
from amp_sparc_spatialmodulation_tpu.utils.cache import (
    enable_persistent_cache)
from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    enable_persistent_cache()
    import dataclasses
    cfg = dataclasses.replace(massive_mimo(), iterations=300)
    ress = [int(a) for a in sys.argv[1:]] or [512, 2048, 4096]
    ebn0 = 18.0
    snr = 10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10)
    snr_dev = jnp.asarray(snr, jnp.float32)
    k1 = 40                           # near the point's T~34 (round-2 row)
    log(f"platform={jax.default_backend()} cfg={cfg.name} cap=300 "
        f"EbN0={ebn0} k1={k1}")
    base = jax.random.PRNGKey(0)
    import os
    use_pallas = os.environ.get("MASSIVE_PALLAS", "0") not in ("0",
                                                               "false")
    for res in ress:
        t0 = time.perf_counter()
        fns = montecarlo.make_two_phase_fns(
            cfg, "bamp", "sparc", res, k1, operator_form="banded",
            use_pallas=use_pallas)
        out = fetch_sums(montecarlo.run_two_phase_realization(
            fns, jax.random.fold_in(base, 999), snr_dev))
        log(f"res={res}: compile+first {time.perf_counter() - t0:.1f}s "
            f"(meanT={out['T'] / out['trials']:.1f} "
            f"fer={out['fer'] / out['trials']:.3f})")
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            tot_T = tot_n = fer = 0.0
            for i in range(2):
                out = fetch_sums(montecarlo.run_two_phase_realization(
                    fns, jax.random.fold_in(base, 8 * r + i), snr_dev))
                tot_T += out["T"]
                tot_n += out["trials"]
                fer += out["fer"]
            dt = time.perf_counter() - t0
            tps = tot_n / dt
            log(f"  res={res} rep{r}: {tot_n:.0f} trials in {dt:.2f}s -> "
                f"{tps:.1f} trials/s (meanT={tot_T / tot_n:.1f}, "
                f"FER={fer / tot_n:.3f})")
            if best is None or tps > best:
                best = tps
        log(f"res={res} BEST: {best:.1f} trials/s")


if __name__ == "__main__":
    main()
