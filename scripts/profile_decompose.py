"""Decompose the flagship BAMP iteration cost on TPU.

Times fixed-iteration (fori_loop) variants of the BAMP body to attribute
per-iteration wall time: linear core (banded matmuls + Onsager) vs
denoiser vs freeze/allclose bookkeeping, plus generation and metrics.

Usage: python scripts/profile_decompose.py [--res 8192] [--iters 16]
"""
from __future__ import annotations

import argparse
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
from amp_sparc_spatialmodulation_tpu.models import montecarlo  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import channel as channel_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import message as message_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import operators  # noqa: E402
from amp_sparc_spatialmodulation_tpu.utils import metrics  # noqa: E402


def fetch(out):
    # Force a REAL device sync: pull the scalar summaries to host (the
    # axon tunnel's block_until_ready does not reliably block).
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a) if getattr(a, "ndim", 3) == 0
        or (hasattr(a, "dtype") and a.dtype == bool) else a, out)


def timeit(fn, *args, reps=5, inner=3):
    out = fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fetch(fn(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    cfg = flagship_bamp_ook()
    res, K1 = args.res, args.iters
    prec = lax.Precision.HIGHEST
    snr = jnp.asarray(10 ** ((8.0 + 10 * np.log10(cfg.code_rate)) / 10),
                      jnp.float32)
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.default_backend()} res={res} iters={K1}",
          flush=True)

    @jax.jit
    def build(key, snr):
        k_chan, k_msg, k_noise = jax.random.split(key, 3)
        msg = message_ops.generate_message(k_msg, cfg, res)
        _, A = operators.banded_sparc(k_chan, cfg, precision=prec)
        y = A.apply(msg.x) + channel_ops.awgn(k_noise, cfg, snr, res)
        return msg, A.h, A.gains, y

    t_build, (msg, _h0, _g0, y) = timeit(build, key, snr)
    print(f"build (chan+msg+awgn):      {t_build*1e3:8.2f} ms", flush=True)

    def make_op(h=None, gains=None):
        if h is None:
            h, gains = _h0, _g0
        return operators.BandedOperator(h=h, gains=gains, Lin=cfg.Lin,
                                        Lout=cfg.Lout, trunc=cfg.trunc,
                                        precision=prec)

    n, N = make_op().shape
    cdtype = y.dtype

    def init_state(y, sigma2):
        return dict(xmap=jnp.zeros((res, N), cdtype),
                    xmmse=jnp.zeros((res, N), cdtype),
                    var=jnp.ones((res, N), jnp.float32),
                    z=y, u=jnp.full((res, n), 1.0, jnp.float32) * sigma2)

    def linear_body(s, op, y, sigma2):
        v = op.apply_abs2(s["var"])
        z = op.apply(s["xmmse"]) - (v * (y - s["z"]) / s["u"]).astype(cdtype)
        u = v + sigma2
        cov = 1.0 / op.apply_abs2T(1.0 / u)
        resid = ((y - z) / u).astype(cdtype)
        xmap = s["xmmse"] + cov * op.apply_adj(resid)
        return xmap, cov, z, u

    @jax.jit
    def variant_linear(h, gains, y, snr):
        op = make_op(h, gains)
        sigma2 = cfg.E / snr

        def body(_, s):
            xmap, cov, z, u = linear_body(s, op, y, sigma2)
            # keep var/xmmse evolving cheaply so nothing is DCE'd
            return dict(xmap=xmap, xmmse=0.99 * xmap, var=0.5 * cov + 1e-6,
                        z=z, u=u)

        final = lax.fori_loop(0, K1, body, init_state(y, sigma2))
        return jnp.sum(jnp.abs(final["xmap"]) ** 2)

    @jax.jit
    def variant_denoise(h, gains, y, snr):
        op = make_op(h, gains)
        sigma2 = cfg.E / snr
        denoiser = bamp.make_denoiser(cfg)

        def body(_, s):
            xmap, cov, z, u = linear_body(s, op, y, sigma2)
            xmmse, var = denoiser(xmap, cov)
            return dict(xmap=xmap, xmmse=xmmse, var=var, z=z, u=u)

        final = lax.fori_loop(0, K1, body, init_state(y, sigma2))
        return jnp.sum(jnp.abs(final["xmap"]) ** 2)

    @jax.jit
    def variant_full_fixed(h, gains, y, snr):
        op = make_op(h, gains)
        sigma2 = cfg.E / snr
        _, s = bamp.decode(op, y, sigma2, cfg, precision=prec,
                           iter_cap=K1, return_state=True)
        return jnp.sum(jnp.abs(s.xmap) ** 2), s.active, s.xmap

    t_lin, _ = timeit(variant_linear, _h0, _g0, y, snr)
    print(f"linear core x{K1}:          {t_lin*1e3:8.2f} ms "
          f"({t_lin/K1*1e3:6.2f} ms/iter)", flush=True)
    t_den, _ = timeit(variant_denoise, _h0, _g0, y, snr)
    print(f"+denoiser x{K1}:            {t_den*1e3:8.2f} ms "
          f"({t_den/K1*1e3:6.2f} ms/iter)", flush=True)
    t_full, (_, active, xmap) = timeit(variant_full_fixed, _h0, _g0, y, snr)
    print(f"+freeze/allclose (while):   {t_full*1e3:8.2f} ms "
          f"({t_full/K1*1e3:6.2f} ms/iter)  active after {K1}: "
          f"{int(np.asarray(active).sum())}", flush=True)

    @jax.jit
    def eval_fn(xmap, msg):
        return metrics.evaluate_sums(xmap, xmap, msg,
                                     jnp.full((res,), K1, jnp.int32), cfg)

    t_eval, _ = timeit(eval_fn, xmap, msg)  # sums are scalars -> fetched
    print(f"metrics eval:               {t_eval*1e3:8.2f} ms", flush=True)

    # end-to-end two-phase for comparison
    fns = montecarlo.make_two_phase_fns(cfg, "bamp", "sparc", res, K1,
                                        operator_form="banded")

    def two_phase(key, snr):
        return montecarlo.run_two_phase_realization(fns, key, snr)

    t_e2e, out = timeit(two_phase, key, snr, reps=4, inner=2)
    out = {k: float(v) for k, v in out.items()}
    print(f"two-phase end-to-end:       {t_e2e*1e3:8.2f} ms  -> "
          f"{res/t_e2e:.0f} trials/s (meanT={out['T']/out['trials']:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
