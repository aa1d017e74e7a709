"""Benchmark: Monte-Carlo decode throughput on the flagship config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: batched BAMP decode of the flagship BAMPfinal OOK system
(Nt=128, Na=8, Nr=24, Lh=3, Lin=20 — SURVEY §6) at its published 8 dB
operating point, including on-device channel generation, message sampling,
decode with per-trial early stopping, and metric reduction — i.e. the same
work the reference does serially per trial (`bamp_model.py:54-60`).

``vs_baseline`` compares trials/s against the PyTorch reference measured
in-place from /root/reference (see reference_baseline.json; the reference
publishes no speed numbers, so we generated the baseline side ourselves).
Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_cache.json")

# Best measurement of THIS process, updated after every rep — the
# watchdog prefers it over the stale disk cache so a stall mid-run
# still reports this-session data (VERDICT r4 item 2).
_session_best = None


def _watchdog(seconds: int):
    """The remote-TPU tunnel intermittently wedges compiles for 10+ minutes
    (uninterruptible XLA calls).  If the measurement exceeds the deadline,
    emit the best measurement so far — this session's partial result when
    at least one rep completed (the rep loop updates ``_session_best``
    and the disk cache incrementally), else the last good run's cache,
    clearly marked — so a wedged tunnel yields an honest number instead
    of a hung process."""
    import threading

    def fire():
        if _session_best is not None:
            out = dict(_session_best)
            out["unit"] += " [partial: tunnel stalled mid-run]"
            print(json.dumps(out), flush=True)
            log(f"watchdog: exceeded {seconds}s; reported this session's "
                "best completed rep")
            os._exit(0)
        try:
            with open(CACHE) as f:
                cached = json.load(f)
            cached["unit"] += " [CACHED: tunnel stalled this run]"
            print(json.dumps(cached), flush=True)
            log(f"watchdog: exceeded {seconds}s (tunnel stall); "
                "reported cached measurement")
            os._exit(0)
        except Exception:
            log(f"watchdog: exceeded {seconds}s and no cache; aborting")
            os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _roofline(cfg, iters_per_s: float) -> dict:
    """FLOPs/bytes accounting of one banded BAMP iteration per trial.

    The linear core is 2 complex banded mat-vecs (H@x, H^H r — 8 real
    flops per complex MAC) and 2 real ones (|H|^2@var, |H|^2^T(1/u) — 2
    flops per MAC), each ``Lin*Nt*Lh*Nr`` MACs (`bamp.py:59-63` on the tap
    form).  Bytes: per-iteration traffic of the (B, N)/(B, n) state planes
    (complex64 xmap/xmmse/z read+write, f32 var/cov/u, y read), taps
    amortized across the trial batch.
    """
    N, n = cfg.Lin * cfg.Nt, cfg.Lout * cfg.Nr
    macs = cfg.Lin * cfg.Nt * cfg.Lh * cfg.Nr
    flops = (8 + 8 + 2 + 2) * macs
    bytes_per = (N * (2 * 8 * 2 + 2 * 4 * 2)       # xmap,xmmse c8 rw; var,cov f32 rw
                 + n * (8 * 2 + 4 * 2 + 8))        # z c8 rw, u f32 rw, y c8 r
    achieved = iters_per_s * flops
    # v5e: 197 TFLOP/s bf16 MXU peak; Precision.HIGHEST f32 is the 6-pass
    # decomposition => /6 effective peak; HBM ~819 GB/s.
    bf16_peak, f32_peak, hbm = 197e12, 197e12 / 6, 819e9
    return {
        "flops_per_iter_trial": flops,
        "arithmetic_intensity": flops / bytes_per,
        "useful_tflops": achieved / 1e12,
        "mfu_vs_f32_highest_peak": achieved / f32_peak,
        "mfu_vs_bf16_peak": achieved / bf16_peak,
        "hbm_bound_tflops": flops / bytes_per * hbm / 1e12,
    }


def main():
    # Tunnel-stalled compiles have been observed at up to ~670s; the
    # watchdog must outlast them or a fresh run degrades to the cached
    # number.  Measurement itself is ~45s once compiled.
    timer = _watchdog(int(os.environ.get("BENCH_TIMEOUT", "900")))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amp_sparc_spatialmodulation_tpu.utils.cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    from amp_sparc_spatialmodulation_tpu.config import flagship_bamp_ook
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums

    cfg = flagship_bamp_ook()
    # res=65536 is the measured single-chip sweet spot; the throughput
    # curve saturates here (round 4: 97.6k trials/s at 65536 vs 97.9k at
    # 98304), and 131072 exhausts HBM — phase1's peak is ~18.9 GB: 8.1 GB
    # of complex decoder state plus 10.8 GB of temporaries (the kernel's
    # f32 plane representation is live while the complex output is
    # assembled).  Larger trial batches amortize the per-batch
    # while_loop sync and keep the MXU fed through the convergence tail.
    # 8 batches = 8 independent channel realizations per rep: enough to
    # keep the sanity FER within channel-selection noise of the published
    # 1.54e-2 while a rep stays ~7s.
    res = int(os.environ.get("BENCH_RES", "65536"))     # trials per batch
    n_batches = int(os.environ.get("BENCH_BATCHES", "8"))
    ebn0 = 8.0
    snr = 10 ** ((ebn0 + 10 * np.log10(cfg.code_rate)) / 10)
    snr_dev = jnp.asarray(snr, jnp.float32)

    log(f"platform={jax.default_backend()} devices={jax.devices()}")
    form = os.environ.get("BENCH_OPERATOR", "banded")
    two_phase = int(os.environ.get("BENCH_TWO_PHASE", "12"))
    pallas_env = os.environ.get("BENCH_PALLAS", "auto")
    use_pallas = ("auto" if pallas_env == "auto"
                  else pallas_env not in ("0", "false"))
    run_batches = None   # set on the two-phase path (deferred-fetch reps)
    if os.environ.get("BENCH_SHARD"):
        # Sharded mode: the same point over ALL local devices (weak
        # scaling switch for the day real multi-chip hardware appears; on
        # one chip it must reproduce the single-chip number within noise).
        from amp_sparc_spatialmodulation_tpu.parallel import (
            mesh as mesh_mod, sweep as psweep)
        D = len(jax.devices())
        m = mesh_mod.make_mesh(trials=D, model=1)
        log(f"BENCH_SHARD: mesh trials={D}")

        def dev_keys(key):
            return jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(D)).reshape(D, 1, 2)

        if two_phase > 0:
            fns = psweep.make_sharded_two_phase_fns(
                cfg, "bamp", "sparc", res, two_phase, m,
                chans_per_device=1, operator_form=form,
                use_pallas=use_pallas)

            shard_hint = {}

            def step(key, snr):
                return psweep.run_sharded_two_phase(fns, dev_keys(key),
                                                    snr, res,
                                                    hint=shard_hint)
        else:
            sstep = psweep.make_sharded_step(cfg, "bamp", "sparc", res, m,
                                             operator_form=form,
                                             use_pallas=use_pallas)

            def step(key, snr):
                return sstep(dev_keys(key), snr)
    elif two_phase > 0:
        fns = montecarlo.make_two_phase_fns(cfg, "bamp", "sparc", res,
                                            two_phase, operator_form=form,
                                            use_pallas=use_pallas)
        hint = {}   # rolling phase123 bucket (single-program realization)

        def step(key, snr):
            return montecarlo.run_two_phase_realization(fns, key, snr,
                                                        hint=hint)

        def run_batches(keys, snr):
            # deferred-fetch rep: device-accumulated sums, ONE transfer
            return montecarlo.run_two_phase_batches(fns, keys, snr, hint)
    else:
        fn = montecarlo.make_realization_fn(cfg, "bamp", "sparc", res,
                                            operator_form=form,
                                            use_pallas=use_pallas)
        step = jax.jit(fn)

    base = jax.random.PRNGKey(0)
    # warmup / compile
    t0 = time.perf_counter()
    out = step(jax.random.fold_in(base, 1000), snr_dev)
    jax.block_until_ready(out)
    log(f"compile+first-batch: {time.perf_counter() - t0:.1f}s")

    # The remote-TPU tunnel shows large intermittent stalls (>10x wall-time
    # variance on identical work); take the best of several repetitions to
    # measure machine capability rather than tunnel weather.
    reps = int(os.environ.get("BENCH_REPS", "4"))
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "reference_baseline.json")
    with open(baseline_path) as f:
        ref = json.load(f)

    def payload_of(rep):
        return {
            "metric": "bamp_flagship_trials_per_s",
            "value": round(rep["trials_per_s"], 2),
            "unit": ("trials/s (BAMPfinal OOK Nt=128 @ 8dB, "
                     "incl. chan+msg gen)"),
            "vs_baseline": round(rep["trials_per_s"] / ref["trials_per_s"],
                                 2),
        }

    global _session_best
    best = None
    batch_runner = run_batches
    for r in range(reps):
        t0 = time.perf_counter()
        if batch_runner is not None:
            keys = [jax.random.fold_in(base, i) for i in range(n_batches)]
            out = batch_runner(keys, snr_dev)
            total_T, total_trials = out["T"], int(out["trials"])
            fer_sum = out["fer"]
        else:
            total_T, total_trials, fer_sum = 0.0, 0, 0.0
            for i in range(n_batches):
                out = fetch_sums(step(jax.random.fold_in(base, i),
                                      snr_dev))
                total_T += out["T"]
                total_trials += int(out["trials"])
                fer_sum += out["fer"]
        dt = time.perf_counter() - t0
        rep = dict(trials_per_s=total_trials / dt, iters_per_s=total_T / dt,
                   dt=dt, total_trials=total_trials,
                   meanT=total_T / total_trials,
                   fer=fer_sum / total_trials)
        log(f"rep {r}: {total_trials} trials in {dt:.2f}s -> "
            f"{rep['trials_per_s']:.1f} trials/s")
        if best is None or rep["trials_per_s"] > best["trials_per_s"]:
            best = rep
            # Incremental checkpoint: a tunnel stall in a LATER rep (or a
            # later-run crash) still reports/caches this-session data.
            _session_best = payload_of(best)
            try:
                with open(CACHE, "w") as f:
                    json.dump(_session_best, f)
            except OSError:
                pass

    trials_per_s = best["trials_per_s"]
    log(f"best: {trials_per_s:.1f} trials/s  meanT={best['meanT']:.2f}  "
        f"FER={best['fer']:.3e}  iters/s={best['iters_per_s']:.0f}")
    rl = _roofline(cfg, best["iters_per_s"])
    log("roofline: "
        f"{rl['flops_per_iter_trial'] / 1e6:.2f} MFLOP/iter/trial, "
        f"AI={rl['arithmetic_intensity']:.0f} flop/B, "
        f"useful {rl['useful_tflops']:.2f} TFLOP/s = "
        f"{rl['mfu_vs_f32_highest_peak']:.1%} of f32-HIGHEST peak "
        f"({rl['mfu_vs_bf16_peak']:.1%} of bf16 peak); "
        f"HBM roof {rl['hbm_bound_tflops']:.1f} TFLOP/s")

    timer.cancel()
    payload = payload_of(best)
    try:
        with open(CACHE, "w") as f:
            json.dump(payload, f)
    except OSError:
        pass
    print(json.dumps(payload))


def _main_with_fallback():
    try:
        main()
    except Exception as e:  # tunnel compile failures are nondeterministic
        log(f"bench failed: {e!r}")
        try:
            with open(CACHE) as f:
                cached = json.load(f)
            cached["unit"] += " [CACHED: this run failed to compile]"
            print(json.dumps(cached), flush=True)
        except Exception:
            raise e


if __name__ == "__main__":
    _main_with_fallback()
