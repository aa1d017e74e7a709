"""Fused banded BAMP iteration — Pallas TPU kernel.

One AMP iteration (`/root/reference/bamp.py:59-63`) is four banded linear
maps plus an elementwise chain.  The XLA path (``ops.operators``) runs
them as separate matmul kernels with every intermediate round-tripping
HBM.  This kernel performs the WHOLE linear part of one iteration in a
single pass per trial tile, entirely in VMEM:

    v     = |H|^2 @ var                  (banded, MXU)
    z'    = H @ xmmse - v * (y - z) / u  (banded + VPU)
    u'    = v + sigma2
    cov   = 1 / (|H|^2^T @ (1/u'))       (banded adjoint, MXU)
    xmap  = xmmse + cov * (H^H @ ((y - z') / u'))

Mosaic-native layout: blocks are ``(block_count, B_tile, features)`` —
the TRIAL TILE is the sublane (second-to-last) dimension (divisible by 8)
and the feature dimension (``Nt`` / ``Nr``) is the lane dimension.  State
crosses the kernel as split re/im float32 planes shaped ``(Lin, B, Nt)``
/ ``(Lout, B, Nr)`` (complex is unsupported in Mosaic), and every
in-kernel op is strictly 2-D — per-channel-use-block matmuls
``(B_tile, Nt) @ (Nt, Lh*Nr)`` over a static ``Lin`` loop, plus 2-D
column slices for the band shift-accumulate.

Grid: 1-D over trial tiles.  The denoiser stays outside (XLA fuses its
elementwise chain well and it differs per algorithm/alphabet).

Backend status: numerically exact vs the XLA path (interpret mode on CPU;
all three truncation geometries).  On the axon remote-compile tunnel the
in-``while_loop`` AOT compile has historically been flaky; the XLA banded
path stays the production default (``use_pallas=False``) unless the
benchmark shows this kernel winning on directly-attached hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_of(c, l, Lin, Lout, trunc):
    """Output block row hit by tap ``l`` of column block ``c`` (or None)."""
    r = c + l
    if trunc == "cyclic":
        return r % Lin
    return r if r < Lout else None


def _iteration_kernel(sigma2_ref, xm_re_ref, xm_im_ref, var_ref,
                      z_re_ref, z_im_ref, u_ref, y_re_ref, y_im_ref,
                      S_re_ref, S_im_ref, S_a2_ref,
                      St_re_ref, St_im_ref, St_a2_ref, g_ref, g2_ref,
                      xmap_re_ref, xmap_im_ref, cov_ref,
                      zn_re_ref, zn_im_ref, un_ref,
                      *, Lin, Lout, Lh, Nt, Nr, trunc):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    sigma2 = sigma2_ref[0]
    S_re, S_im, S_a2 = S_re_ref[:], S_im_ref[:], S_a2_ref[:]  # (Nt, Lh*Nr)
    St_re, St_im, St_a2 = St_re_ref[:], St_im_ref[:], St_a2_ref[:]

    # ---- forward banded maps, one channel-use block at a time ----------
    # v[r] = sum_l g2[l, r-l] |h_l|^2 var[r-l] ;  Hx likewise with h.
    # Accumulate into the y-side output refs (zero-init first).
    for r in range(Lout):
        zn_re_ref[r] = jnp.zeros_like(zn_re_ref[r])
        zn_im_ref[r] = jnp.zeros_like(zn_im_ref[r])
        un_ref[r] = jnp.zeros_like(un_ref[r])

    for c in range(Lin):
        xc_re = xm_re_ref[c]                     # (Bt, Nt)
        xc_im = xm_im_ref[c]
        vc = var_ref[c]
        Pv = dot(vc, S_a2)                       # (Bt, Lh*Nr)
        Pr = dot(xc_re, S_re) - dot(xc_im, S_im)
        Pi = dot(xc_im, S_re) + dot(xc_re, S_im)
        for l in range(Lh):
            r = _row_of(c, l, Lin, Lout, trunc)
            if r is None:
                continue
            sl = slice(l * Nr, (l + 1) * Nr)
            un_ref[r] += g2_ref[l, c] * Pv[:, sl]
            zn_re_ref[r] += g_ref[l, c] * Pr[:, sl]
            zn_im_ref[r] += g_ref[l, c] * Pi[:, sl]

    # ---- Onsager residual + variances (`bamp.py:60-61`) ----------------
    # At this point un_ref holds v, zn_ref holds Hx.
    for r in range(Lout):
        v = un_ref[r]
        w = v / u_ref[r]
        zn_re_ref[r] = zn_re_ref[r] - w * (y_re_ref[r] - z_re_ref[r])
        zn_im_ref[r] = zn_im_ref[r] - w * (y_im_ref[r] - z_im_ref[r])
        un_ref[r] = v + sigma2

    # ---- backward banded maps (`bamp.py:62-63`) ------------------------
    for c in range(Lin):
        zs_c, zs_re, zs_im = [], [], []
        for l in range(Lh):
            r = _row_of(c, l, Lin, Lout, trunc)
            if r is None:
                uinv = jnp.zeros_like(un_ref[0])
                rr = jnp.zeros_like(uinv)
                ri = rr
            else:
                uinv = 1.0 / un_ref[r]
                rr = (y_re_ref[r] - zn_re_ref[r]) * uinv
                ri = (y_im_ref[r] - zn_im_ref[r]) * uinv
            zs_c.append(g2_ref[l, c] * uinv)
            zs_re.append(g_ref[l, c] * rr)
            zs_im.append(g_ref[l, c] * ri)
        Zc = jnp.concatenate(zs_c, axis=1)       # (Bt, Lh*Nr)
        Zr = jnp.concatenate(zs_re, axis=1)
        Zi = jnp.concatenate(zs_im, axis=1)
        cov_c = 1.0 / dot(Zc, St_a2)             # (Bt, Nt)
        # H^H r: re = Zr S_re^T + Zi S_im^T ; im = Zi S_re^T - Zr S_im^T
        adj_re = dot(Zr, St_re) + dot(Zi, St_im)
        adj_im = dot(Zi, St_re) - dot(Zr, St_im)
        cov_ref[c] = cov_c
        xmap_re_ref[c] = xm_re_ref[c] + cov_c * adj_re
        xmap_im_ref[c] = xm_im_ref[c] + cov_c * adj_im


def _pick_tile(B: int, N: int, n: int, Lh: int, Nr: int, Nt: int) -> int:
    """Largest trial tile (sublane dim, multiple of 8) whose working set
    fits VMEM.

    When the grid has more than one program, Pallas double-buffers the
    grid-dependent blocks (pipelined prefetch), so the budget must cover
    TWO copies of every blocked operand.
    """
    budget = 11 * 1024 * 1024
    lane = lambda d: -(-d // 128) * 128       # Mosaic pads lanes to 128
    Lin, Lout = N // Nt, n // Nr
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if B % tile != 0:
            continue
        xside = 6 * tile * Lin * lane(Nt) * 4
        yside = 9 * tile * Lout * lane(Nr) * 4
        mult = 1 if tile == B else 2          # double-buffered when grid > 1
        if mult * (xside + yside) < budget:
            return tile
    return 0


def _call(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
          S_re, S_im, S_a2, g, g2, geom, interpret):
    Lin, Lout, Lh, Nt, Nr, tile, trunc = geom
    B = xm_re.shape[1]
    grid = (B // tile,)

    def xspec():
        return pl.BlockSpec((Lin, tile, Nt), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def yspec():
        return pl.BlockSpec((Lout, tile, Nr), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_iteration_kernel, Lin=Lin, Lout=Lout, Lh=Lh,
                             Nt=Nt, Nr=Nr, trunc=trunc)
    out_shape = [jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32),  # xmap re
                 jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32),  # xmap im
                 jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32),  # cov
                 jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32),  # z re
                 jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32),  # z im
                 jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32)]  # u
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]      # sigma2 (1,)
        + [xspec(), xspec(), xspec(), yspec(), yspec(), yspec(),
           yspec(), yspec(), full(), full(), full(), full(), full(), full(),
           pl.BlockSpec(memory_space=pltpu.SMEM),      # gains
           pl.BlockSpec(memory_space=pltpu.SMEM)],     # gains^2
        out_specs=[xspec(), xspec(), xspec(), yspec(), yspec(), yspec()],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=interpret,
    )(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
      S_re, S_im, S_a2, S_re.T, S_im.T, S_a2.T, g, g2)


class FusedBandedIteration:
    """Callable wrapping the fused kernel for a fixed banded operator.

    Built from an :class:`..operators.BandedOperator`; ``__call__`` maps
    (B, ·)-major complex jnp state to the kernel's block-major split
    planes, runs the kernel, and returns ``(xmap, cov, z_new, u_new)`` in
    the decoder's layout — a drop-in for the linear part of the BAMP
    iteration.
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

    def _to_x(self, a):
        """(B, Lin*Nt) -> (Lin, B, Nt)."""
        B = a.shape[0]
        return a.reshape(B, self.op.Lin, self.op.Nt).transpose(1, 0, 2)

    def _to_y(self, a):
        B = a.shape[0]
        return a.reshape(B, self.op.Lout, self.op.Nr).transpose(1, 0, 2)

    def _from_x(self, a):
        return a.transpose(1, 0, 2).reshape(a.shape[1], -1)

    def _from_y(self, a):
        return a.transpose(1, 0, 2).reshape(a.shape[1], -1)

    def __call__(self, xmmse, var, z, u, y, sigma2):
        sig = jnp.asarray(sigma2, jnp.float32).reshape(1)
        out = _call(sig,
                    self._to_x(jnp.real(xmmse)), self._to_x(jnp.imag(xmmse)),
                    self._to_x(var),
                    self._to_y(jnp.real(z)), self._to_y(jnp.imag(z)),
                    self._to_y(u),
                    self._to_y(jnp.real(y)), self._to_y(jnp.imag(y)),
                    self.S_re, self.S_im, self.S_a2, self.g, self.g2,
                    self.geom, self.interpret)
        xmap_re, xmap_im, cov, zr, zi, un = out
        return (jax.lax.complex(self._from_x(xmap_re),
                                self._from_x(xmap_im)),
                self._from_x(cov),
                jax.lax.complex(self._from_y(zr), self._from_y(zi)),
                self._from_y(un))
