"""Fused whole-decode kernel for the damped Rangan VAMP (vamp2).

vamp2's iteration (`/root/reference/vamp2.py:56-88`) is denoiser-first
with rho=0.97 damping on ``xmmse`` and ``gamma``, gamma-precision
bookkeeping, and the LMMSE correction against the WHITENED data
``y_tilde = (U^H y)/s`` — two dense complex matmuls against ``Vh`` per
iteration, exactly the transform structure of :mod:`.fused_vamp`, so
this kernel reuses its tap layout: six Gauss 3-multiplication combo
planes (forward ``r_tilde @ Vh^T``: (c, d-c, c+d); backward
``w @ conj(Vh)``: (c, -d-c, c-d)) resident in VMEM across the in-kernel
iteration ``while_loop``, state planes blocked per trial tile, per-trial
freeze/convergence/T in-kernel, ``cap`` in SMEM (resumable — two-phase
continuation batching and the sharded sweeps compose).

The whitening itself stays OUTSIDE (it divides by ``s`` and therefore
needs the direct SVD's accurate small singular values — the reason
vamp2 is excluded from the Gram-eigh route and the SV-domain model
axis, `models/vamp.py::svd`); the kernel consumes ``y_tilde`` as a
per-trial blocked input.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bamp import NoVmemTileError, make_dot
from .fused_vamp import _pick_chunk, _pick_tile_vamp, _seg_denoiser_lanes

_VAR_MIN = 1e-11        # `vamp2.py:48-49`
_VAR_MAX = 1e11


def _vamp2_decode_kernel(sigma2_ref, cap_ref, act_ref, T_ref,
                         r_re_ref, r_im_ref, gamma_ref, var_ref,
                         xm_re_ref, xm_im_ref,
                         yt_re_ref, yt_im_ref, s2_ref,
                         *tap_and_out_refs,
                         N, p, M, chunk, sym_re, sym_im, eta, rho,
                         precision, cmul="gauss"):
    """Whole vamp2 decode for one trial tile (`vamp2.py:56-88` semantics,
    per-trial allclose early stop on the posterior variance)."""
    ntaps = 6 if cmul == "gauss" else 4
    taps = tap_and_out_refs[:ntaps]
    (r_re_o, r_im_o, gamma_o, var_o, xm_re_o, xm_im_o,
     act_o, T_o) = tap_and_out_refs[ntaps:]
    dot = make_dot(precision)
    noise_var = sigma2_ref[0]
    cap = cap_ref[0]
    init = (jnp.int32(0), act_ref[:], T_ref[:],
            r_re_ref[:], r_im_ref[:], gamma_ref[:], var_ref[:],
            xm_re_ref[:], xm_im_ref[:])

    def cond(c):
        return jnp.logical_and(c[0] < cap, jnp.sum(c[1]) > 0.0)

    def body(c):
        t, act, T, r_re, r_im, gamma, var, xm_re, xm_im = c
        # Denoiser + damping (`vamp2.py:62-63`); tau = gamma, no halving,
        # second-moment variance (`vamp2.py:79-88`).
        dn_re, dn_im, varn = _seg_denoiser_lanes(
            r_re, r_im, gamma, N=N, M=M, chunk=chunk,
            sym_re=sym_re, sym_im=sym_im, halve=False,
            var_form="second_moment")
        xmn_re = rho * dn_re + (1.0 - rho) * xm_re
        xmn_im = rho * dn_im + (1.0 - rho) * xm_im
        alpha = (dot(varn, jnp.ones((N, 1), jnp.float32)) / N
                 * gamma)                                    # (Bt, 1)

        inv1a = 1.0 / (1.0 - alpha)
        rt_re = (xmn_re - alpha * r_re) * inv1a              # `vamp2.py:66`
        rt_im = (xmn_im - alpha * r_im) * inv1a
        gamma_tilde = jnp.clip(gamma * (1.0 - alpha) / alpha,
                               _VAR_MIN, _VAR_MAX)

        d = s2_ref[:] / (s2_ref[:] + noise_var * gamma_tilde)  # (Bt, p)
        d_mean = dot(d, jnp.ones((p, 1), jnp.float32)) / p
        gamma_new = gamma_tilde * d_mean / (eta - d_mean)    # `vamp2.py:72`
        gamman = rho * gamma_new + (1.0 - rho) * gamma

        # q = r_tilde @ Vh^T (complex) — Gauss: k1=(a+b)@c, k2=a@(d-c),
        # k3=b@(c+d); re=k1-k3, im=k1+k2.
        if cmul == "gauss":
            k1 = dot(rt_re + rt_im, taps[0][:])
            k2 = dot(rt_re, taps[1][:])
            k3 = dot(rt_im, taps[2][:])
            q_re, q_im = k1 - k3, k1 + k2                    # (Bt, p)
        else:
            q_re = dot(rt_re, taps[0][:]) - dot(rt_im, taps[1][:])
            q_im = dot(rt_re, taps[1][:]) + dot(rt_im, taps[0][:])
        scale = d / d_mean
        w_re = scale * (yt_re_ref[:] - q_re)
        w_im = scale * (yt_im_ref[:] - q_im)
        # r = r_tilde + eta * w @ conj(Vh): re=A@c+B@d, im=B@c-A@d — the
        # forward identity with d -> -d.
        if cmul == "gauss":
            k1 = dot(w_re + w_im, taps[3][:])
            k2 = dot(w_re, taps[4][:])
            k3 = dot(w_im, taps[5][:])
            rn_re = rt_re + eta * (k1 - k3)                  # (Bt, N)
            rn_im = rt_im + eta * (k1 + k2)
        else:
            rn_re = rt_re + eta * (dot(w_re, taps[2][:])
                                   + dot(w_im, taps[3][:]))
            rn_im = rt_im + eta * (dot(w_im, taps[2][:])
                                   - dot(w_re, taps[3][:]))

        # per-trial torch.allclose(var_new, var_old) (`vamp2.py:93-98`)
        bad = (jnp.abs(varn - var)
               > 1e-8 + 1e-5 * jnp.abs(var)).astype(jnp.float32)
        notok = bad.sum(axis=1, keepdims=True)               # (Bt, 1)
        sel = lambda new, old: jnp.where(act > 0.0, new, old)
        return (t + 1,
                act * (notok > 0.0).astype(jnp.float32),
                T + act,
                sel(rn_re, r_re), sel(rn_im, r_im),
                sel(gamman, gamma), sel(varn, var),
                sel(xmn_re, xm_re), sel(xmn_im, xm_im))

    c = jax.lax.while_loop(cond, body, init)
    _, act, T, r_re, r_im, gamma, var, xm_re, xm_im = c
    act_o[:] = act
    T_o[:] = T
    r_re_o[:] = r_re
    r_im_o[:] = r_im
    gamma_o[:] = gamma
    var_o[:] = var
    xm_re_o[:] = xm_re
    xm_im_o[:] = xm_im


class FusedVamp2Decode:
    """One ``pallas_call`` per vamp2 decode on a fixed (direct) SVD."""

    @classmethod
    def covers(cls, cfg) -> bool:
        """Semantic coverage (segmented denoiser only — same as VAMP)."""
        return (cfg.mode in ("segmented", "sparc") and cfg.is_complex
                and cfg.M > 0)

    @classmethod
    def fits(cls, cfg, batch: int) -> bool:
        N = cfg.Lin * cfg.Nt
        p = min(cfg.Lout * cfg.Nr, N)
        n_vh = 6 if os.environ.get("AMP_KERNEL_CMUL", "gauss") == "gauss" \
            else 4
        return _pick_tile_vamp(batch, N, p, cfg.K, cfg.M,
                               _pick_chunk(N, cfg.M), n_vh) > 0

    def __init__(self, Vh, batch: int, interpret: bool = False,
                 symbols=None, M: int = 0, chunk: int | None = None,
                 precision=jax.lax.Precision.HIGHEST,
                 damping: float = 0.97):
        if symbols is None or len(symbols) < 1:
            raise ValueError("whole-decode kernel needs a symbol table")
        if M <= 0:
            raise ValueError("whole-decode kernel needs segment size M")
        syms = [complex(s) for s in symbols]
        self.sym_re = tuple(np.float32(s.real) for s in syms)
        self.sym_im = tuple(np.float32(s.imag) for s in syms)
        self.M = M
        self.interpret = interpret
        self.precision = precision
        self.rho = float(damping)
        self.cmul = os.environ.get("AMP_KERNEL_CMUL", "gauss")
        p, N = Vh.shape
        self.p, self.N = int(p), int(N)
        self.chunk = _pick_chunk(self.N, M) if chunk is None else chunk
        if self.N % self.chunk or self.chunk % M:
            raise ValueError("chunk must divide N and be a multiple of M")
        tile = _pick_tile_vamp(batch, self.N, self.p, len(syms), M,
                               self.chunk,
                               6 if self.cmul == "gauss" else 4)
        if tile == 0:
            raise NoVmemTileError(
                "no trial tile fits VMEM for this geometry")
        self.tile = tile
        Vh_re = jnp.real(Vh).astype(jnp.float32)
        Vh_im = jnp.imag(Vh).astype(jnp.float32)
        if self.cmul == "gauss":
            self.taps = (Vh_re.T, Vh_im.T - Vh_re.T, Vh_re.T + Vh_im.T,
                         Vh_re, -Vh_im - Vh_re, Vh_re - Vh_im)
        else:
            self.taps = (Vh_re.T, Vh_im.T, Vh_re, Vh_im)

    def decode_call(self, sigma2, cap, act, T, r_re, r_im, gamma, var,
                    xm_re, xm_im, yt_re, yt_im, s2, eta: float):
        """Run the full decode; state planes are plain (B, ·) float32.

        Returns ``(r_re, r_im, gamma, var, xmmse_re, xmmse_im, act, T)``;
        all eight alias their inputs.
        """
        N, p, tile = self.N, self.p, self.tile
        B = act.shape[0]
        grid = (B // tile,)
        nspec = lambda: pl.BlockSpec((tile, N), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        pspec = lambda: pl.BlockSpec((tile, p), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        aspec = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        n_shape = jax.ShapeDtypeStruct((B, N), jnp.float32)
        a_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
        kern = functools.partial(_vamp2_decode_kernel, N=N, p=p, M=self.M,
                                 chunk=self.chunk, sym_re=self.sym_re,
                                 sym_im=self.sym_im, eta=float(eta),
                                 rho=self.rho, precision=self.precision,
                                 cmul=self.cmul)
        # inputs: 0 sigma2, 1 cap, 2 act, 3 T, 4 r_re, 5 r_im, 6 gamma,
        # 7 var, 8 xm_re, 9 xm_im, 10-11 y_tilde, 12 s2, 13+ taps;
        # outputs: 0-5 state, 6 act, 7 T
        aliases = {4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5, 2: 6, 3: 7}
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem(), smem(), aspec(), aspec()]
            + [nspec(), nspec(), aspec(), nspec(), nspec(), nspec()]
            + [pspec(), pspec()]
            + [full()] * (1 + len(self.taps)),
            out_specs=[nspec(), nspec(), aspec(), nspec(), nspec(),
                       nspec(), aspec(), aspec()],
            out_shape=[n_shape, n_shape, a_shape, n_shape, n_shape,
                       n_shape, a_shape, a_shape],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=self.interpret,
        )(jnp.asarray(sigma2, jnp.float32).reshape(1),
          jnp.asarray(cap, jnp.int32).reshape(1), act, T,
          r_re, r_im, gamma, var, xm_re, xm_im,
          yt_re, yt_im, s2, *self.taps)
