"""Same-process A/B: fancy-index scatter vs static slice-chain BandedOperator."""
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
from amp_sparc_spatialmodulation_tpu.ops import channel as channel_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import message as message_ops  # noqa: E402
from amp_sparc_spatialmodulation_tpu.ops import operators  # noqa: E402


class ScatterBanded(operators.BandedOperator):
    """The pre-optimization fancy-index implementation, for A/B timing."""

    def _fwd(self, x, taps_stack, gains):
        B = x.shape[0]
        xb = x.reshape(B * self.Lin, self.Nt)
        P = jnp.matmul(xb, taps_stack, precision=self.precision).reshape(
            B, self.Lin, self.Lh, self.Nr)
        y = jnp.zeros((B, self.Lout, self.Nr), P.dtype)
        for l in range(self.Lh):
            rows, cols = self._rows(l)
            contrib = gains[l, cols][None, :, None] * P[:, cols, l]
            y = y.at[:, rows].add(contrib)
        return y.reshape(B, self.Lout * self.Nr)

    def _bwd(self, z, taps_stack, gains):
        B = z.shape[0]
        zb = z.reshape(B, self.Lout, self.Nr)
        Zl = jnp.zeros((B, self.Lin, self.Lh, self.Nr), zb.dtype)
        for l in range(self.Lh):
            rows, cols = self._rows(l)
            Zl = Zl.at[:, cols, l].set(gains[l, cols][None, :, None]
                                       * zb[:, rows])
        r = jnp.matmul(Zl.reshape(B * self.Lin, self.Lh * self.Nr),
                       jnp.conj(taps_stack).T, precision=self.precision)
        return r.reshape(B, self.Lin * self.Nt)


def timeit(fn, *args, reps=6, inner=3):
    out = float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


def main():
    cfg = flagship_bamp_ook()
    res = int(os.environ.get("RES", "8192"))
    K1 = 16
    prec = lax.Precision.HIGHEST
    snr = jnp.asarray(10 ** ((8.0 + 10 * np.log10(cfg.code_rate)) / 10),
                      jnp.float32)
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.default_backend()} res={res}", flush=True)

    @jax.jit
    def build(key, snr):
        k_chan, k_msg, k_noise = jax.random.split(key, 3)
        msg = message_ops.generate_message(k_msg, cfg, res)
        _, A = operators.banded_sparc(k_chan, cfg, precision=prec)
        y = A.apply(msg.x) + channel_ops.awgn(k_noise, cfg, snr, res)
        return A.h, A.gains, y

    h, gains, y = build(key, snr)

    def make_variant(cls):
        @jax.jit
        def run(h, gains, y, snr):
            op = cls(h=h, gains=gains, Lin=cfg.Lin, Lout=cfg.Lout,
                     trunc=cfg.trunc, precision=prec)
            sigma2 = cfg.E / snr
            cdtype = y.dtype
            n, N = op.shape
            s0 = dict(xmmse=jnp.zeros((res, N), cdtype),
                      var=jnp.ones((res, N), jnp.float32),
                      z=y, u=jnp.full((res, n), 1.0, jnp.float32) * sigma2)

            def body(_, s):
                v = op.apply_abs2(s["var"])
                z = (op.apply(s["xmmse"])
                     - (v * (y - s["z"]) / s["u"]).astype(cdtype))
                u = v + sigma2
                cov = 1.0 / op.apply_abs2T(1.0 / u)
                resid = ((y - z) / u).astype(cdtype)
                xmap = s["xmmse"] + cov * op.apply_adj(resid)
                return dict(xmmse=0.99 * xmap, var=0.5 * cov + 1e-6,
                            z=z, u=u)

            final = lax.fori_loop(0, K1, body, s0)
            return jnp.sum(jnp.abs(final["xmmse"]) ** 2)

        return run

    # interleave to cancel tunnel drift
    variants = {"scatter": make_variant(ScatterBanded),
                "slices": make_variant(operators.BandedOperator)}
    results = {k: [] for k in variants}
    vals = {}
    for round_ in range(3):
        for name, fn in variants.items():
            t, v = timeit(fn, h, gains, y, snr, reps=2, inner=2)
            results[name].append(t)
            vals[name] = v
    for name, ts in results.items():
        best = min(ts)
        print(f"{name:8s}: {best*1e3:8.2f} ms / {K1} iters "
              f"({best/K1*1e3:6.2f} ms/iter)  checksum={vals[name]:.6e}",
              flush=True)


if __name__ == "__main__":
    main()
