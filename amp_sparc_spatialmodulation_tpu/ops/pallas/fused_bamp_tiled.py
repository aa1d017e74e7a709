"""Frame-tiled fused BAMP iteration — the massive-MIMO Pallas kernel.

The whole-decode kernel (:mod:`.fused_bamp`) needs every frame block of a
trial tile resident in VMEM; the massive geometry (Nt=1344, Lin=32 —
`/root/reference/Simulations/BAMP/OOK,segmented/.../Nt=1344,...`) cannot
tile that way (x-side blocks alone exceed the budget), so it fell back to
the XLA banded path (~762 trials/s, ~29% of the f32-HIGHEST roof, round
5).  This kernel tiles the FRAME instead: one ``pallas_call`` per AMP
iteration, grid over (trial tiles x y-frame tiles), each program

  * reads a 3-block x window (its owned block plus both neighbors,
    clamped at the frame edges and zeroed in-kernel — the zeros stand in
    for the operator's out-of-frame columns exactly),
  * computes the banded FORWARD for rows ``[cF, cF + F + Lh - 1)`` — its
    own y rows plus the ``Lh-1``-row halo the backward needs, recomputed
    locally instead of communicated (grid programs are sequential on
    TPU, so same-call neighbor results cannot be awaited),
  * writes its y block (the tail program's pad rows get the
    deterministic ``zn=0, un=sigma2`` the zero-extended operator
    implies),
  * runs the BACKWARD + segmented denoiser + freeze + allclose count for
    its owned x block.

Per-program forward redundancy is ``(Lh-1)/F`` (31% at F=16, Lh=6) — the
price of zero cross-program communication.  Iterations chain through an
XLA ``while_loop`` (the per-iteration dispatch is ~100us against a
~20ms iteration at the massive dims).  Covers the production massive
path: 'tail' truncation, per-tap-constant gains (every SPARC base
matrix), complex segmented REAL alphabets (OOK/BPSK; ``xmmse_im ≡ 0``
drops the x-side imaginary state exactly as in the whole-decode
kernel).  Reference semantics: `/root/reference/bamp.py:48-77,136-141`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bamp import (NoVmemTileError, _PlaneKernelBase, _seg_denoiser,
                         make_dot)


def _tiled_iteration_kernel(sigma2_ref, act_ref,
                            xlo_ref, xc_ref, xhi_ref,
                            vlo_ref, vc_ref, vhi_ref,
                            z_re0_ref, z_re1_ref, z_im0_ref, z_im1_ref,
                            u0_ref, u1_ref, y_re0_ref, y_re1_ref,
                            y_im0_ref, y_im1_ref,
                            Sf_ref, S_a2_ref, St_re_ref, amc_ref,
                            St_a2_ref, adm_ref,
                            xmap_re_o, xmap_im_o, xn_re_o, varn_o,
                            zn_re_o, zn_im_o, un_o, notok_o,
                            *, F, n_xt, Lh, Nt, Nr, Bt, M, sym_re, sym_im,
                            precision):
    """One frame-tiled iteration step for program (trial tile i, y tile j).

    Row bookkeeping (see module docstring): with ``c = min(j, n_xt-1)``
    the owned x block, the forward covers global y rows
    ``[cF, cF + F + Lh - 1)`` from x rows ``[cF - Lh + 1, cF + F + Lh -
    1)``; the y write block is rows ``[jF, (j+1)F)`` — a dynamic row
    slice at offset 0 (j < n_xt) or ``F*Bt`` (the tail program) of the
    constant-padded forward planes.
    """
    j = pl.program_id(1)
    c = jnp.minimum(j, n_xt - 1)
    W = Lh * Nr
    wpad = -(-W // 128) * 128
    dot = make_dot(precision)
    x2 = lambda r: r[:].reshape(-1, r.shape[-1])
    sigma2 = sigma2_ref[0]

    # ---- x window: 3 blocks, edges zeroed (out-of-frame columns) ------
    first = c == 0
    last = c == n_xt - 1
    xlo = jnp.where(first, 0.0, x2(xlo_ref))
    xhi = jnp.where(last, 0.0, x2(xhi_ref))
    vlo = jnp.where(first, 0.0, x2(vlo_ref))
    vhi = jnp.where(last, 0.0, x2(vhi_ref))
    xw = jnp.concatenate([xlo, x2(xc_ref), xhi], axis=0)   # (3F*Bt, Nt)
    vw = jnp.concatenate([vlo, x2(vc_ref), vhi], axis=0)
    # only rows [cF - Lh + 1, cF + F + Lh - 1) feed the forward
    r0 = (F - Lh + 1) * Bt
    r1 = (2 * F + Lh - 1) * Bt
    xw = xw[r0:r1]
    vw = vw[r0:r1]

    # ---- forward: fused k1||k2 matmul + Pv ----------------------------
    k12 = dot(xw, Sf_ref[:])                   # (rows, 2*wpad)
    k1 = k12[:, :W]
    k2 = k12[:, wpad:wpad + W]
    Pr, Pi = k1, k1 + k2                       # real x (Gauss identity)
    Pv = dot(vw, S_a2_ref[:])

    # ---- band fold: out[r] = sum_l P[r + Lh-1-l], lane group l --------
    ny = (F + Lh - 1) * Bt                     # forward output rows

    def foldshift(P):
        acc = None
        for l in range(Lh):
            o = (Lh - 1 - l) * Bt
            s = P[o:o + ny]
            r = s if l == 0 else pltpu.roll(s, shift=W - l * Nr, axis=1)
            acc = r if acc is None else acc + r
        return acc[:, :Nr]

    v = foldshift(Pv)                          # (ny, Nr)
    hx_re = foldshift(Pr)
    hx_im = foldshift(Pi)

    # ---- Onsager on the y window (same global rows) -------------------
    yw = lambda a, b: jnp.concatenate([x2(a), x2(b)], axis=0)[:ny]
    z_re = yw(z_re0_ref, z_re1_ref)
    z_im = yw(z_im0_ref, z_im1_ref)
    u = yw(u0_ref, u1_ref)
    y_re = yw(y_re0_ref, y_re1_ref)
    y_im = yw(y_im0_ref, y_im1_ref)
    w_ = v / u
    zn_re = hx_re - w_ * (y_re - z_re)
    zn_im = hx_im - w_ * (y_im - z_im)
    un = v + sigma2

    # ---- y write block: rows [jF, (j+1)F) -----------------------------
    # Pad the forward planes to 2F*Bt rows with the zero-extended
    # operator's values (zn=0, un=sigma2); the write rows are the low
    # half (j < n_xt) or the high half (the tail program) — BOTH slices
    # are static (Mosaic has no dynamic_slice), selected per program.
    pad = (2 * F * Bt) - ny

    def ywrite(plane, fill):
        p = jnp.concatenate(
            [plane, jnp.full((pad, Nr), fill, jnp.float32)], axis=0)
        return jnp.where(j == n_xt, p[F * Bt:], p[:F * Bt])

    act = act_ref[:]                           # (Bt, 1)
    my = jnp.concatenate([act] * F, axis=0)    # (F*Bt, 1)
    # previous y state of the WRITE block (block c for j < n_xt, block
    # c+1 for the tail program — both windows are loaded) for the
    # per-trial freeze.
    tail = j == n_xt
    old = lambda r0, r1: jnp.where(tail, x2(r1), x2(r0))
    rowid = jax.lax.broadcasted_iota(jnp.int32, (F * Bt, Nr), 0)
    is_pad = rowid >= jnp.where(tail, ny - F * Bt, F * Bt)

    def put_y(o_ref, plane, fill, old_plane):
        w = ywrite(plane, fill)
        w = jnp.where(is_pad, fill, w)         # deterministic pad rows
        o_ref[:] = jnp.where(my > 0.0, w, old_plane).reshape(F, Bt, Nr)

    put_y(zn_re_o, zn_re, 0.0, old(z_re0_ref, z_re1_ref))
    put_y(zn_im_o, zn_im, 0.0, old(z_im0_ref, z_im1_ref))
    un_w = ywrite(un, 1.0)
    un_w = jnp.where(is_pad, sigma2, un_w)
    un_o[:] = jnp.where(my > 0.0, un_w,
                        old(u0_ref, u1_ref)).reshape(F, Bt, Nr)

    # ---- backward for x block c ---------------------------------------
    uinv = 1.0 / un
    rr = (y_re - zn_re) * uinv
    ri = (y_im - zn_im) * uinv

    def gather(p):
        return jnp.concatenate(
            [p[l * Bt:(F + l) * Bt] for l in range(Lh)], axis=1)

    Zc = gather(uinv)                          # (F*Bt, W)
    Zr = gather(rr)
    Zi = gather(ri)
    cov = 1.0 / dot(Zc, St_a2_ref[:])          # (F*Bt, Nt)
    k1b = dot(Zr + Zi, St_re_ref[:])
    k2b = dot(Zr, amc_ref[:])
    k3b = dot(Zi, adm_ref[:])
    adj_re = k1b - k3b
    adj_im = k1b + k2b
    xm_c = x2(xc_ref)
    xmap_re = xm_c + cov * adj_re
    xmap_im = cov * adj_im                     # real x: xm_im == 0

    # ---- denoiser (real alphabet) + freeze + allclose count -----------
    dn_re, _, varn = _seg_denoiser(xmap_re, None, cov, Nt=Nt, M=M,
                                   sym_re=sym_re, sym_im=sym_im)
    var_c = x2(vc_ref)
    bad = (jnp.abs(varn - var_c)
           > 1e-8 + 1e-5 * jnp.abs(var_c)).astype(jnp.float32)
    notok = bad.sum(axis=1, keepdims=True)     # (F*Bt, 1)
    mx = my                                    # same (F*Bt, 1) trial mask
    sel = lambda m, new, old: jnp.where(m > 0.0, new, old)
    xmap_re_o[:] = xmap_re.reshape(F, Bt, Nt)
    xmap_im_o[:] = xmap_im.reshape(F, Bt, Nt)
    xn_re_o[:] = sel(mx, dn_re, xm_c).reshape(F, Bt, Nt)
    varn_o[:] = sel(mx, varn, var_c).reshape(F, Bt, Nt)
    notok_o[:] = notok.reshape(F, Bt, 1)


class TiledBandedIteration(_PlaneKernelBase):
    """Frame-tiled per-iteration kernel for geometries whose whole frame
    cannot sit in VMEM (massive MIMO).  Exposes the same ``plane_call``
    contract as ``FusedBandedIteration(fuse_denoiser=True)`` — the
    decoder's plane loop drives either interchangeably — with the y-side
    padding to ``n_yt * F`` rows handled internally per call.

    Requirements (the production massive path satisfies all): 'tail'
    truncation, per-tap-constant gains, complex segmented REAL alphabet
    (all ``sym_im == 0``), ``F | Lin`` with ``F >= Lh - 1``.
    """

    fuse_denoiser = True

    @classmethod
    def covers(cls, cfg, batch: int | None = None) -> bool:
        """cfg-level coverage for 'auto' resolution: complex-channel
        segmented/sparc mode with a REAL alphabet, 'tail' truncation,
        and a viable frame tile (F | Lin, F >= Lh-1).  Gains
        per-tap-constancy holds for every sparc/toeplitz banded
        operator and is re-checked at construction."""
        if not (cfg.mode in ("segmented", "sparc") and cfg.is_complex
                and cfg.M > 0 and cfg.trunc == "tail"):
            return False
        try:
            if any(complex(s).imag != 0.0 for s in cfg.symbols):
                return False
        except TypeError:
            return False
        if batch is not None and batch % 8:
            return False
        return any(cfg.Lin % f == 0 and f >= cfg.Lh - 1
                   for f in (16, 8, 4))

    def __init__(self, op, batch: int, interpret: bool = False,
                 symbols=None, M: int = 0, F: int | None = None,
                 tile: int | None = None,
                 precision=jax.lax.Precision.HIGHEST):
        import os
        if op.trunc != "tail":
            raise NoVmemTileError("tiled kernel covers 'tail' truncation")
        if symbols is None or M <= 0:
            raise ValueError("tiled kernel needs a symbol table and M")
        syms = [complex(s) for s in symbols]
        if any(s.imag != 0.0 for s in syms):
            raise NoVmemTileError("tiled kernel covers real alphabets")
        self.sym_re = tuple(np.float32(s.real) for s in syms)
        self.sym_im = tuple(np.float32(0.0) for _ in syms)
        self.M = M
        self.interpret = interpret
        self.precision = precision
        Lin, Lh = op.Lin, op.Lh
        if F is None:
            F = int(os.environ.get("AMP_TILED_F", "0")) or 0
            if not F:
                # largest F <= 16 dividing Lin with F >= Lh-1
                for cand in (16, 8, 4):
                    if Lin % cand == 0 and cand >= Lh - 1:
                        F = cand
                        break
        if not F or Lin % F or F < Lh - 1:
            raise NoVmemTileError(
                f"no frame tile for Lin={Lin}, Lh={Lh}")
        self.F = F
        self.n_xt = Lin // F
        self.n_yt = self.n_xt + 1
        self.Lout_pad = self.n_yt * F
        tile = tile or int(os.environ.get("AMP_TILED_TILE", "16"))
        while batch % tile and tile > 8:
            tile //= 2
        if batch % tile:
            raise NoVmemTileError(f"trial tile {tile} !| batch {batch}")
        self._setup(op, tile)
        if self._gains_per_tap() is None:
            raise NoVmemTileError(
                "tiled kernel needs per-tap-constant gains")
        self.taps = self._fold_taps("gauss", real_x=True)
        # slots: stacked fwd, dummy, S_a2, St_re, amc, St_a2, dummy, adm
        self._t = (self.taps[0], self.taps[2], self.taps[3],
                   self.taps[4], self.taps[5], self.taps[7])

    def plane_call(self, sigma2, xm_re, xm_im, var, z_re, z_im, u,
                   y_re, y_im, act=None):
        """Same contract as ``FusedBandedIteration.plane_call`` with the
        fused denoiser: returns ``(xmap_re, xmap_im, xn_re, xn_im, varn,
        zn_re, zn_im, un, notok)`` on ``(Lin|Lout, B, ·)`` planes.  The
        x-side imaginary planes are identically zero (real alphabet) and
        pass through untouched."""
        op = self.op
        F, n_xt, n_yt = self.F, self.n_xt, self.n_yt
        Lin, Lout, Lh, Nt, Nr = op.Lin, op.Lout, op.Lh, op.Nt, op.Nr
        Bt = self.geom[5]
        B = xm_re.shape[1]
        if act is None:
            act = jnp.ones((B, 1), jnp.float32)
        padn = self.Lout_pad - Lout

        def pady(a, fill):
            return jnp.concatenate(
                [a, jnp.full((padn, B, Nr), fill, jnp.float32)], axis=0)

        zp_re, zp_im = pady(z_re, 0.0), pady(z_im, 0.0)
        up = pady(u, 1.0)
        yp_re, yp_im = pady(y_re, 0.0), pady(y_im, 0.0)

        c_of = lambda j: jnp.minimum(j, n_xt - 1)
        xmap = lambda d: (lambda i, j: (jnp.clip(c_of(j) + d, 0,
                                                 n_xt - 1), i, 0))
        ymap = lambda d: (lambda i, j: (c_of(j) + d, i, 0))
        xspec = lambda d: pl.BlockSpec((F, Bt, Nt), xmap(d),
                                       memory_space=pltpu.VMEM)
        yspec = lambda d: pl.BlockSpec((F, Bt, Nr), ymap(d),
                                       memory_space=pltpu.VMEM)
        owrite_x = pl.BlockSpec((F, Bt, Nt),
                                lambda i, j: (c_of(j), i, 0),
                                memory_space=pltpu.VMEM)
        owrite_n = pl.BlockSpec((F, Bt, 1),
                                lambda i, j: (c_of(j), i, 0),
                                memory_space=pltpu.VMEM)
        owrite_y = pl.BlockSpec((F, Bt, Nr), lambda i, j: (j, i, 0),
                                memory_space=pltpu.VMEM)
        aspec = pl.BlockSpec((Bt, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        x_shape = jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32)
        yp_shape = jax.ShapeDtypeStruct((self.Lout_pad, B, Nr),
                                        jnp.float32)
        n_shape = jax.ShapeDtypeStruct((Lin, B, 1), jnp.float32)
        kern = functools.partial(
            _tiled_iteration_kernel, F=F, n_xt=n_xt, Lh=Lh, Nt=Nt, Nr=Nr,
            Bt=Bt, M=self.M, sym_re=self.sym_re, sym_im=self.sym_im,
            precision=self.precision)
        out = pl.pallas_call(
            kern,
            grid=(B // Bt, n_yt),
            in_specs=[smem(), aspec,
                      xspec(-1), xspec(0), xspec(1),
                      xspec(-1), xspec(0), xspec(1),
                      yspec(0), yspec(1), yspec(0), yspec(1),
                      yspec(0), yspec(1), yspec(0), yspec(1),
                      yspec(0), yspec(1)]
            + [full()] * 6,
            out_specs=[owrite_x, owrite_x, owrite_x, owrite_x,
                       owrite_y, owrite_y, owrite_y, owrite_n],
            out_shape=[x_shape, x_shape, x_shape, x_shape,
                       yp_shape, yp_shape, yp_shape, n_shape],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=self.interpret,
        )(jnp.asarray(sigma2, jnp.float32).reshape(1), act,
          xm_re, xm_re, xm_re, var, var, var,
          zp_re, zp_re, zp_im, zp_im, up, up, yp_re, yp_re, yp_im, yp_im,
          *self._t)
        xmap_re, xmap_im, xn_re, varn, znp_re, znp_im, unp, notok = out
        return (xmap_re, xmap_im, xn_re, xm_im, varn,
                znp_re[:Lout], znp_im[:Lout], unp[:Lout], notok)
