"""Fused banded BAMP iteration — Pallas TPU kernel.

One AMP iteration (`/root/reference/bamp.py:59-63`) is four banded linear
maps plus an elementwise chain.  The XLA path (``ops.operators``) runs
them as four separate matmul kernels with every intermediate round-tripping
HBM.  This kernel performs the WHOLE linear part of one iteration in a
single pass per trial tile, entirely in VMEM:

    v     = |H|^2 @ var                  (banded, MXU)
    z'    = H @ xmmse - v * (y - z) / u  (banded + VPU)
    u'    = v + sigma2
    cov   = 1 / (|H|^2^T @ (1/u'))       (banded adjoint, MXU)
    xmap  = xmmse + cov * (H^H @ ((y - z') / u'))

Complex state crosses the kernel boundary as split re/im float32 planes
(TPU Pallas has no native complex); the banded structure enters through
the tap-stacked matrices ``S = h.reshape -> (Nt, Lh*Nr)`` and per-(tap,
column-block) gains, exactly as in ``ops.operators.BandedOperator``.

Grid: 1-D over trial tiles (``B_tile`` trials per program).  Everything a
program touches fits in VMEM: x-side planes are ``(B_tile, Lin*Nt)``,
y-side planes ``(B_tile, Lout*Nr)``, the tap stacks are a few hundred KB.
The denoiser stays outside (XLA fuses its elementwise chain well and it
differs per algorithm/alphabet).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_band(P, gains, trunc, B, Lin, Lout, Nr, Lh):
    """Shift-accumulate P (B, Lin, Lh, Nr) into y (B, Lout*Nr).

    The band is contiguous in the column-block dimension, so every tap is
    a static slice (Pallas kernels cannot capture index-array constants).
    """
    def zeros(k):
        return jnp.zeros((B, k, Nr), P.dtype)

    y = jnp.zeros((B, Lout, Nr), P.dtype)
    for l in range(Lh):
        w = gains[l][None, :, None] * P[:, :, l]          # (B, Lin, Nr)
        if trunc == "tail":
            parts = ([zeros(l)] if l else []) + [w]
            if Lout - Lin - l:
                parts.append(zeros(Lout - Lin - l))
            y = y + jnp.concatenate(parts, axis=1)
        elif trunc == "trunc":
            parts = ([zeros(l)] if l else []) + [w[:, :Lin - l]]
            y = y + (jnp.concatenate(parts, axis=1) if l else w)
        else:  # cyclic: block c lands on row (c+l) mod Lin
            y = y + (jnp.roll(w, l, axis=1) if l else w)
    return y.reshape(B, Lout * Nr)


def _bwd_band(z, gains, trunc, B, Lin, Lout, Nr, Lh):
    """Gather gain-weighted z blocks into Z (B*Lin, Lh*Nr) (adjoint)."""
    zb = z.reshape(B, Lout, Nr)
    parts = []
    for l in range(Lh):
        if trunc == "tail":
            g = gains[l][None, :, None] * zb[:, l:l + Lin]
        elif trunc == "trunc":
            w = gains[l][None, :Lin - l, None] * zb[:, l:Lin]
            g = (jnp.concatenate([w, jnp.zeros((B, l, Nr), z.dtype)],
                                 axis=1) if l else w)
        else:  # cyclic
            g = gains[l][None, :, None] * (jnp.roll(zb, -l, axis=1)
                                           if l else zb)
        parts.append(g)
    Z = jnp.stack(parts, axis=2)                          # (B, Lin, Lh, Nr)
    return Z.reshape(B * Lin, Lh * Nr)


def _iteration_kernel(sigma2_ref, xm_re_ref, xm_im_ref, var_ref,
                      z_re_ref, z_im_ref, u_ref, y_re_ref, y_im_ref,
                      S_re_ref, S_im_ref, S_a2_ref, g_ref, g2_ref,
                      xmap_re_ref, xmap_im_ref, cov_ref,
                      zn_re_ref, zn_im_ref, un_ref,
                      *, Lin, Lout, Lh, Nt, Nr, trunc):
    B = xm_re_ref.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    sigma2 = sigma2_ref[0]

    S_re, S_im, S_a2 = S_re_ref[:], S_im_ref[:], S_a2_ref[:]
    g, g2 = g_ref[:], g2_ref[:]

    # ---- forward banded maps: v = |H|^2 var ; Hx = H xmmse -------------
    var2d = var_ref[:].reshape(B * Lin, Nt)
    Pv = dot(var2d, S_a2).reshape(B, Lin, Lh, Nr)
    v = _fwd_band(Pv, g2, trunc, B, Lin, Lout, Nr, Lh)          # (B, n)

    xr2d = xm_re_ref[:].reshape(B * Lin, Nt)
    xi2d = xm_im_ref[:].reshape(B * Lin, Nt)
    P_re = (dot(xr2d, S_re) - dot(xi2d, S_im)).reshape(B, Lin, Lh, Nr)
    P_im = (dot(xr2d, S_im) + dot(xi2d, S_re)).reshape(B, Lin, Lh, Nr)
    Hx_re = _fwd_band(P_re, g, trunc, B, Lin, Lout, Nr, Lh)
    Hx_im = _fwd_band(P_im, g, trunc, B, Lin, Lout, Nr, Lh)

    # ---- Onsager residual + variances (`bamp.py:60-61`) ----------------
    y_re, y_im = y_re_ref[:], y_im_ref[:]
    w = v / u_ref[:]
    zn_re = Hx_re - w * (y_re - z_re_ref[:])
    zn_im = Hx_im - w * (y_im - z_im_ref[:])
    un = v + sigma2
    zn_re_ref[:] = zn_re
    zn_im_ref[:] = zn_im
    un_ref[:] = un

    # ---- backward banded maps: cov and H^H resid (`bamp.py:62-63`) -----
    uinv = 1.0 / un
    Zc = _bwd_band(uinv, g2, trunc, B, Lin, Lout, Nr, Lh)
    cov = 1.0 / dot(Zc, S_a2.T).reshape(B, Lin * Nt)
    cov_ref[:] = cov

    r_re = (y_re - zn_re) * uinv
    r_im = (y_im - zn_im) * uinv
    Z_re = _bwd_band(r_re, g, trunc, B, Lin, Lout, Nr, Lh)
    Z_im = _bwd_band(r_im, g, trunc, B, Lin, Lout, Nr, Lh)
    # H^H r = (Z @ conj(S)).T-form: re = Zre Sre^T + Zim Sim^T, etc.
    adj_re = (dot(Z_re, S_re.T) + dot(Z_im, S_im.T)).reshape(B, Lin * Nt)
    adj_im = (dot(Z_im, S_re.T) - dot(Z_re, S_im.T)).reshape(B, Lin * Nt)
    xmap_re_ref[:] = xm_re_ref[:] + cov * adj_re
    xmap_im_ref[:] = xm_im_ref[:] + cov * adj_im


def _pick_tile(B: int, N: int, n: int, Lh: int, Nr: int, Nt: int) -> int:
    """Largest power-of-two trial tile whose working set fits VMEM."""
    budget = 10 * 1024 * 1024
    for tile in (256, 128, 64, 32, 16, 8):
        if B % tile != 0:
            continue
        xside = 7 * tile * N * 4             # xm re/im, var, cov, xmap re/im, P
        yside = 9 * tile * n * 4
        if xside + yside < budget:
            return tile
    return 0


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _call(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
          S_re, S_im, S_a2, g, g2, geom, interpret):
    Lin, Lout, Lh, Nt, Nr, tile, trunc = geom
    B = xm_re.shape[0]
    N, n = Lin * Nt, Lout * Nr
    grid = (B // tile,)

    def xspec():
        return pl.BlockSpec((tile, N), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def yspec():
        return pl.BlockSpec((tile, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_iteration_kernel, Lin=Lin, Lout=Lout, Lh=Lh,
                             Nt=Nt, Nr=Nr, trunc=trunc)
    out_shape = [jax.ShapeDtypeStruct((B, N), jnp.float32),   # xmap re
                 jax.ShapeDtypeStruct((B, N), jnp.float32),   # xmap im
                 jax.ShapeDtypeStruct((B, N), jnp.float32),   # cov
                 jax.ShapeDtypeStruct((B, n), jnp.float32),   # z re
                 jax.ShapeDtypeStruct((B, n), jnp.float32),   # z im
                 jax.ShapeDtypeStruct((B, n), jnp.float32)]   # u
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]      # sigma2 (1,)
        + [xspec(), xspec(), xspec(), yspec(), yspec(), yspec(),
           yspec(), yspec(), full(), full(), full(), full(), full()],
        out_specs=[xspec(), xspec(), xspec(), yspec(), yspec(), yspec()],
        out_shape=out_shape,
        interpret=interpret,
    )(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
      S_re, S_im, S_a2, g, g2)


class FusedBandedIteration:
    """Callable wrapping the fused kernel for a fixed banded operator.

    Built from an :class:`..operators.BandedOperator`; ``__call__`` maps
    complex jnp state to split planes, runs the kernel, and returns
    ``(xmap, cov, z_new, u_new)`` as complex/real jnp arrays — a drop-in
    for the linear part of the BAMP iteration body.
    """

    def __init__(self, op, batch: int, interpret: bool = False):
        self.op = op
        self.interpret = interpret
        tile = _pick_tile(batch, op.Lin * op.Nt, op.Lout * op.Nr,
                          op.Lh, op.Nr, op.Nt)
        if tile == 0:
            raise ValueError("no trial tile fits VMEM for this geometry")
        self.geom = (op.Lin, op.Lout, op.Lh, op.Nt, op.Nr, tile, op.trunc)
        self.S_re = jnp.real(op.h_stack)
        self.S_im = jnp.imag(op.h_stack)
        self.S_a2 = op.abs_h2_stack
        self.g = op.gains
        self.g2 = op.gains2

    def __call__(self, xmmse, var, z, u, y, sigma2):
        sig = jnp.asarray(sigma2, jnp.float32).reshape(1)
        out = _call(sig, jnp.real(xmmse), jnp.imag(xmmse), var,
                    jnp.real(z), jnp.imag(z), u,
                    jnp.real(y), jnp.imag(y),
                    self.S_re, self.S_im, self.S_a2, self.g, self.g2,
                    self.geom, self.interpret)
        xmap_re, xmap_im, cov, zr, zi, un = out
        return (jax.lax.complex(xmap_re, xmap_im), cov,
                jax.lax.complex(zr, zi), un)
