"""Fused whole-decode SCAMP kernel — one ``pallas_call`` per decode.

SCAMP (`/root/reference/scamp.py:43-59`) differs from BAMP in its state
evolution: the per-iteration variances live on the BASE-MATRIX grid —
section variances ``psi (B, Lin)`` and residual variances ``phi (B,
Lout)`` — and couple through tiny ``W (Lout, Lin)`` products, while the
two big banded mat-vecs (``A @ xmmse``, ``A^H (z/phi)``) carry all the
FLOPs.  In-kernel, the base-matrix bookkeeping runs on small ``(Bt, Lin)``
/ ``(Bt, Lout)`` planes; crossing between those and the big block-major
compute planes uses one-hot indicator matmuls (expansion: row block ``r``
of the plane gets lane ``r`` of the small plane broadcast; gathering is
the transpose) — pure MXU ops, no relayouts.

Like :class:`.fused_bamp.FusedBandedDecode`, the whole iteration loop runs
inside the kernel (per-tile early exit, per-trial freeze/T, ``cap`` as an
SMEM scalar for two-phase resume) and the segmented softmax denoiser is
the general-K ``_seg_denoiser`` in its mean-only form (`scamp.py:61-68`).
``estimate_phi`` switches the residual variance to the empirical per-block
mean of ``|z|^2`` (the reference's ``estSCAMP``, `sparc.py:199`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bamp import (_DOT, NoVmemTileError, _PlaneKernelBase,
                         _band_gather, _band_shift, _pick_tile,
                         _seg_denoiser, _x2d)


def _banded_fwd(xr, xi, S_re, S_im, Gf, *, Lin, Lout, Lh, Nr, Bt, trunc):
    """``A @ x`` (complex) on collapsed planes: (Lin*Bt, Nt) -> (Lout*Bt,
    Nr).  Same big-matmul + masked-shift + roll lane-fold scheme as the
    BAMP kernel's forward pass: Gauss 3-multiplication complex product
    (3 MXU matmuls instead of 4 at unchanged precision) and the VPU
    lane-roll fold (both measured faster in the BAMP stage profiler)."""
    dot = functools.partial(jnp.dot, **_DOT)
    k1 = dot(xr + xi, S_re)
    k2 = dot(xr, S_im - S_re)
    k3 = dot(xi, S_re + S_im)
    Pr = Gf * (k1 - k3)
    Pi = Gf * (k1 + k2)
    W = Lh * Nr
    group = jax.lax.broadcasted_iota(jnp.int32, Pr.shape, 1) // Nr
    acc_re = acc_im = None
    for l in range(Lh):
        m = group == l
        cr = _band_shift(jnp.where(m, Pr, 0.0), l, Bt, Lin, Lout, trunc)
        ci = _band_shift(jnp.where(m, Pi, 0.0), l, Bt, Lin, Lout, trunc)
        acc_re = cr if acc_re is None else acc_re + cr
        acc_im = ci if acc_im is None else acc_im + ci

    def lanefold(acc):
        s = acc
        for l in range(1, Lh):
            s = s + pltpu.roll(acc, shift=W - l * Nr, axis=1)
        return s[:, :Nr]

    return lanefold(acc_re), lanefold(acc_im)


def _banded_adj(rr, ri, St_re, St_im, Gf, *, Lin, Lout, Lh, Bt, trunc):
    """``A^H r`` on collapsed planes: (Lout*Bt, Nr) -> (Lin*Bt, Nt).

    Gauss form of re=A@c+B@d, im=B@c-A@d (the forward identity with
    d -> -d): k1=(A+B)@c, k2=A@(-d-c), k3=B@(c-d)."""
    dot = functools.partial(jnp.dot, **_DOT)
    Zr = jnp.concatenate(
        [_band_gather(rr, l, Bt, Lin, Lout, trunc) for l in range(Lh)],
        axis=1)
    Zi = jnp.concatenate(
        [_band_gather(ri, l, Bt, Lin, Lout, trunc) for l in range(Lh)],
        axis=1)
    A, B = Gf * Zr, Gf * Zi
    k1 = dot(A + B, St_re)
    k2 = dot(A, -St_im - St_re)
    k3 = dot(B, St_re - St_im)
    return k1 - k3, k1 + k2


def _expand_rows(v, nblocks, lanes):
    """(Bt, nblocks) -> (nblocks*Bt, lanes): row block ``r`` holds lane
    ``r`` of ``v`` broadcast over all lanes (one-hot indicator matmuls —
    no cross-layout moves)."""
    dot = functools.partial(jnp.dot, **_DOT)
    parts = []
    for r in range(nblocks):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (nblocks, lanes), 0)
                  == r).astype(jnp.float32)
        parts.append(dot(v, onehot))
    return jnp.concatenate(parts, axis=0)


def _gather_rows(col, nblocks, Bt):
    """(nblocks*Bt, 1) -> (Bt, nblocks) (transpose of :func:`_expand_rows`
    for a per-block scalar column)."""
    dot = functools.partial(jnp.dot, **_DOT)
    out = None
    for r in range(nblocks):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, nblocks), 1)
                  == r).astype(jnp.float32)
        p = dot(col[r * Bt:(r + 1) * Bt], onehot)
        out = p if out is None else out + p
    return out


def _scamp_decode_kernel(sigma2_ref, cap_ref, act_ref, T_ref,
                         xmap_re_ref, xmap_im_ref, xm_re_ref, xm_im_ref,
                         psi_ref, phi_ref, z_re_ref, z_im_ref,
                         y_re_ref, y_im_ref, W_ref, Wt_ref,
                         S_re_ref, S_im_ref, St_re_ref, St_im_ref, Gf_ref,
                         xmap_re_o, xmap_im_o, xn_re_o, xn_im_o,
                         psi_o, phi_o, zn_re_o, zn_im_o, act_o, T_o,
                         *, Lin, Lout, Lh, Nt, Nr, Bt, trunc, M,
                         sym_re, sym_im, Na, estimate_phi):
    """Whole SCAMP decode for one trial tile (`scamp.py:43-59` + the
    `scamp.py:101-106` psi-allclose early stop, per-trial)."""
    dot = functools.partial(jnp.dot, **_DOT)
    sigma2 = sigma2_ref[0]
    cap = cap_ref[0]
    y_re, y_im = _x2d(y_re_ref, Bt, Nr), _x2d(y_im_ref, Bt, Nr)
    W = W_ref[:]            # (Lout, Lin)
    Wt = Wt_ref[:]          # (Lin, Lout)
    S_re, S_im = S_re_ref[:], S_im_ref[:]
    St_re, St_im = St_re_ref[:], St_im_ref[:]
    Gf = Gf_ref[:]
    L_total = float(Na * Lin)   # cfg.L for segmented/sparc
    ones_nt = jnp.ones((Nt, 1), jnp.float32)
    fwd = functools.partial(_banded_fwd, S_re=S_re, S_im=S_im, Gf=Gf,
                            Lin=Lin, Lout=Lout, Lh=Lh, Nr=Nr, Bt=Bt,
                            trunc=trunc)
    adj = functools.partial(_banded_adj, St_re=St_re, St_im=St_im, Gf=Gf,
                            Lin=Lin, Lout=Lout, Lh=Lh, Bt=Bt, trunc=trunc)

    init = (jnp.int32(0), act_ref[:], T_ref[:],
            _x2d(xmap_re_ref, Bt, Nt), _x2d(xmap_im_ref, Bt, Nt),
            _x2d(xm_re_ref, Bt, Nt), _x2d(xm_im_ref, Bt, Nt),
            psi_ref[:], phi_ref[:],
            _x2d(z_re_ref, Bt, Nr), _x2d(z_im_ref, Bt, Nr))

    def cond(c):
        return jnp.logical_and(c[0] < cap, jnp.sum(c[1]) > 0.0)

    def body(c):
        (t, act, T, xmap_re, xmap_im, xm_re, xm_im, psi, phi,
         z_re, z_im) = c
        gma = dot(psi, Wt) / Lin                         # (Bt, Lout); /Lc
        # b on the SMALL plane first: phi starts at inf, and expanding inf
        # through an indicator matmul would make inf*0 = NaN.
        b = gma / phi                                    # 0 on iter 0 (inf)
        b_p = _expand_rows(b, Lout, Nr)                  # (Lout*Bt, Nr)
        hxr, hxi = fwd(xm_re, xm_im)
        znr = y_re - hxr + b_p * z_re
        zni = y_im - hxi + b_p * z_im
        if estimate_phi:
            m2 = dot(znr * znr + zni * zni,
                     jnp.ones((Nr, 1), jnp.float32)) / Nr
            phi_n = _gather_rows(m2, Lout, Bt)           # `sparc.py:199`
        else:
            phi_n = sigma2 + gma                         # `scamp.py:50`
        tau = L_total / dot(1.0 / phi_n, W) / Nr         # (Bt, Lin); /Mr
        tau_p = _expand_rows(tau, Lin, Nt)               # (Lin*Bt, Nt)
        phin_p = _expand_rows(phi_n, Lout, Nr)
        ar, ai = adj(znr / phin_p, zni / phin_p)
        xr_n = xm_re + tau_p * ar
        xi_n = xm_im + tau_p * ai
        dn_re, dn_im, _ = _seg_denoiser(xr_n, xi_n, tau_p, Nt=Nt, M=M,
                                        sym_re=sym_re, sym_im=sym_im,
                                        want_var=False)
        mag = dot(dn_re * dn_re + dn_im * dn_im, ones_nt)  # (Lin*Bt, 1)
        psi_n = 1.0 - _gather_rows(mag, Lin, Bt) / Na      # `scamp.py:59`
        # per-trial torch.allclose(psi_n, psi) (`scamp.py:101-106`)
        bad = (jnp.abs(psi_n - psi) > 1e-8 + 1e-5 * jnp.abs(psi)
               ).astype(jnp.float32)
        notok = bad.sum(axis=1, keepdims=True)             # (Bt, 1)
        mx = jnp.concatenate([act] * Lin, axis=0)
        my = jnp.concatenate([act] * Lout, axis=0)
        sel = lambda m, new, old: jnp.where(m > 0.0, new, old)
        return (t + 1,
                act * (notok > 0.0).astype(jnp.float32),
                T + act,
                sel(mx, xr_n, xmap_re), sel(mx, xi_n, xmap_im),
                sel(mx, dn_re, xm_re), sel(mx, dn_im, xm_im),
                sel(act, psi_n, psi), sel(act, phi_n, phi),
                sel(my, znr, z_re), sel(my, zni, z_im))

    c = jax.lax.while_loop(cond, body, init)
    (_, act, T, xmap_re, xmap_im, xm_re, xm_im, psi, phi, z_re, z_im) = c
    act_o[:] = act
    T_o[:] = T
    xmap_re_o[:] = xmap_re.reshape(Lin, Bt, Nt)
    xmap_im_o[:] = xmap_im.reshape(Lin, Bt, Nt)
    xn_re_o[:] = xm_re.reshape(Lin, Bt, Nt)
    xn_im_o[:] = xm_im.reshape(Lin, Bt, Nt)
    psi_o[:] = psi
    phi_o[:] = phi
    zn_re_o[:] = z_re.reshape(Lout, Bt, Nr)
    zn_im_o[:] = z_im.reshape(Lout, Bt, Nr)


class FusedScampDecode(_PlaneKernelBase):
    """One ``pallas_call`` per SCAMP decode on a fixed banded operator.

    Resumable like :class:`.fused_bamp.FusedBandedDecode` (``cap`` is the
    remaining-iteration SMEM scalar; ``act``/``T``/``psi``/``phi`` cross
    the kernel), so it composes with two-phase continuation batching and
    the sharded sweeps.
    """

    @classmethod
    def covers(cls, cfg) -> bool:
        """Semantic coverage (SCAMP has only the segmented denoiser)."""
        return (cfg.mode in ("segmented", "sparc") and cfg.is_complex
                and cfg.M > 0)

    @classmethod
    def fits(cls, cfg, batch: int) -> bool:
        """VMEM trial-tile fit — the constructor's own ``_pick_tile``."""
        return _pick_tile(batch, 9 + 2 * cfg.K, 8, cfg.Lin, cfg.Lout,
                          cfg.Nt, cfg.Nr) > 0

    def __init__(self, op, W, batch: int, interpret: bool = False,
                 symbols=None, M: int = 0, Na: int = 0,
                 estimate_phi: bool = False):
        if symbols is None or len(symbols) < 1:
            raise ValueError("whole-decode kernel needs a symbol table")
        if M <= 0 or Na <= 0:
            raise ValueError("whole-decode kernel needs M and Na")
        syms = [complex(s) for s in symbols]
        self.sym_re = tuple(np.float32(s.real) for s in syms)
        self.sym_im = tuple(np.float32(s.imag) for s in syms)
        self.M = M
        self.Na = Na
        self.estimate_phi = estimate_phi
        self.interpret = interpret
        K = len(syms)
        tile = _pick_tile(batch, 9 + 2 * K, 8, op.Lin, op.Lout,
                          op.Nt, op.Nr)
        if tile == 0:
            raise NoVmemTileError(
                "no trial tile fits VMEM for this geometry")
        self._setup(op, tile)
        self.W = jnp.asarray(W, jnp.float32)
        self.Wt = self.W.T

    def decode_call(self, sigma2, cap, act, T,
                    xmap_re, xmap_im, xm_re, xm_im, psi, phi,
                    z_re, z_im, y_re, y_im):
        """Run the full SCAMP decode on block-major split planes.

        ``psi (B, Lin)`` / ``phi (B, Lout)`` ride as small per-trial
        planes.  Returns ``(xmap_re, xmap_im, xmmse_re, xmmse_im, psi,
        phi, z_re, z_im, act, T)``; state planes alias their inputs.
        """
        Lin, Lout, Lh, Nt, Nr, tile, trunc = self.geom
        B = act.shape[0]
        grid = (B // tile,)
        xspec = lambda: pl.BlockSpec((Lin, tile, Nt), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)
        yspec = lambda: pl.BlockSpec((Lout, tile, Nr), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)
        aspec = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        x_shape = jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32)
        y_shape = jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32)
        kern = functools.partial(
            _scamp_decode_kernel, Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr,
            Bt=tile, trunc=trunc, M=self.M, sym_re=self.sym_re,
            sym_im=self.sym_im, Na=self.Na, estimate_phi=self.estimate_phi)
        # inputs: 0 sigma2, 1 cap, 2 act, 3 T, 4-7 x-planes, 8 psi, 9 phi,
        # 10-11 z, 12-13 y, 14 W, 15 Wt, 16-19 taps, 20 gains
        # outputs: 0-3 x-planes, 4 psi, 5 phi, 6-7 z, 8 act, 9 T
        aliases = {4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5, 10: 6, 11: 7,
                   2: 8, 3: 9}
        out_shape = ([x_shape] * 4
                     + [jax.ShapeDtypeStruct((B, Lin), jnp.float32),
                        jax.ShapeDtypeStruct((B, Lout), jnp.float32)]
                     + [y_shape] * 2
                     + [jax.ShapeDtypeStruct((B, 1), jnp.float32)] * 2)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem(), smem(), aspec(1), aspec(1)]
            + [xspec()] * 4 + [aspec(Lin), aspec(Lout)]
            + [yspec()] * 4 + [full()] * 7,
            out_specs=[xspec()] * 4 + [aspec(Lin), aspec(Lout)]
            + [yspec()] * 2 + [aspec(1)] * 2,
            out_shape=out_shape,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=self.interpret,
        )(jnp.asarray(sigma2, jnp.float32).reshape(1),
          jnp.asarray(cap, jnp.int32).reshape(1), act, T,
          xmap_re, xmap_im, xm_re, xm_im, psi, phi, z_re, z_im,
          y_re, y_im, self.W, self.Wt,
          self.S_re, self.S_im, self.S_re.T, self.S_im.T, self.Gf)
