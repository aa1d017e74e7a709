"""Fused whole-decode VAMP kernel — one ``pallas_call`` per decode.

VAMP's iteration (`/root/reference/vamp.py:56-94`) is two dense complex
matmuls against the channel SVD factor ``Vh (p, N)`` plus a long
elementwise chain (LMMSE scaling, extrinsic subtraction with alpha
clipping, the segmented denoiser WITHOUT the tau/2 halving, extrinsic
update).  Measured on a v5e the XLA decode reaches only ~7% of the
f32-HIGHEST matmul roof — the state round-trips HBM every iteration and
VAMP runs at its iteration cap (no early-stop tail to hide it).  This
kernel keeps the whole decode VMEM-resident: the four split-real ``Vh``
planes (~24 MB for the flagship geometry) stay in VMEM across the
in-kernel iteration loop, every (Bt, N) state plane lives in registers/
VMEM, and per-trial freeze/convergence/T run in-kernel exactly like
:class:`.fused_bamp.FusedBandedDecode` (``cap`` in SMEM → resumable, so
two-phase and the sharded sweeps compose).

Unlike BAMP/SCAMP there is no banded structure: state planes are plain
``(Bt, N)`` with ``N`` on the lane dimension, and the per-trial scalar
bookkeeping of the reference (``sigma2_tilde``, ``alpha``, ``dxdr``) rides
as ``(Bt, 1)`` planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bamp import NoVmemTileError, _seg_denoiser, make_dot

_VR_MIN = 1e-5          # `vamp.py:51-52`
_VR_MAX = 1.0 - _VR_MIN
_VAR_MIN = 1e-9         # `vamp.py:53-54`
_VAR_MAX = 1e5


def _pick_chunk(N: int, M: int) -> int:
    """Lane-chunk size for the in-kernel denoiser.  BAMP applies
    :func:`.fused_bamp._seg_denoiser` to (rows, Nt=128)-ish planes where
    the (Nt, Nt/M) segment-indicator matmuls are tiny; VAMP's state plane
    is the full (Bt, N) with N in the thousands, and a whole-plane call
    would materialize (N, N/M) indicators — ~26 MB of VMEM for the
    flagship N=2560 — which is what overflowed VMEM in the first measured
    attempt.  Chunking the lane axis fixes it: every chunk shares the
    SAME iota-built indicator pair (CSE'd by the compiler), so the
    working set drops to (chunk, chunk/M).  Chunks must align to both
    segment (M) and lane-tile (128) boundaries."""
    for c in (512, 256, 128):
        if N % c == 0 and c % M == 0:
            return c
    return N


def _seg_denoiser_lanes(xr, xi, cov, *, N, M, chunk, sym_re, sym_im,
                        halve=False, var_form="decomposed"):
    """Apply the segmented denoiser per lane chunk (see
    :func:`_pick_chunk`); ``cov`` is a per-trial (rows, 1) plane so it
    broadcasts into every chunk unchanged."""
    if chunk >= N:
        return _seg_denoiser(xr, xi, cov, Nt=N, M=M, sym_re=sym_re,
                             sym_im=sym_im, halve=halve,
                             var_form=var_form)
    outs = [_seg_denoiser(xr[:, i:i + chunk], xi[:, i:i + chunk], cov,
                          Nt=chunk, M=M, sym_re=sym_re, sym_im=sym_im,
                          halve=halve, var_form=var_form)
            for i in range(0, N, chunk)]
    return tuple(jnp.concatenate(parts, axis=1) for parts in zip(*outs))


def _vamp_decode_kernel(sigma2_ref, cap_ref, act_ref, T_ref,
                        rt_re_ref, rt_im_ref, s2t_ref,
                        r_re_ref, r_im_ref, var_ref,
                        xm_re_ref, xm_im_ref,
                        yt_re_ref, yt_im_ref, s2_ref,
                        *tap_and_out_refs,
                        N, p, M, chunk, sym_re, sym_im, eta,
                        precision, cmul="gauss", batched=False):
    """Whole VAMP decode for one trial tile (`vamp.py:56-94` semantics,
    per-trial allclose early stop on the posterior variance
    `vamp.py:181-186`).

    The resident Vh factor planes are read from their refs INSIDE the
    loop body, at the dot that consumes them: hoisting ``ref[:]`` above
    the ``while_loop`` makes each a loop-live vector-register value, and
    the register allocator spills them (plus their multi-pass matmul
    decompositions) — measured 100.58M of spill slots on the flagship
    geometry, tile-independent, overflowing the 128M VMEM space.

    ``cmul='gauss'`` uses the Gauss 3-multiplication complex-product
    identity on both transforms (6 MXU matmuls per iteration instead of
    8 at unchanged precision); the tap-plane combos arrive precomputed
    as six resident refs — forward (c, d-c, c+d) of ``Vh^T`` and
    backward (c, -d-c, c-d) of ``Vh`` — instead of the standard four."""
    ntaps = 6 if cmul == "gauss" else 4
    raw_taps = tap_and_out_refs[:ntaps]
    (rt_re_o, rt_im_o, s2t_o, r_re_o, r_im_o, var_o,
     xm_re_o, xm_im_o, act_o, T_o) = tap_and_out_refs[ntaps:]
    # Realization-batched mode: tap refs are (1, ·, ·) grid blocks of a
    # (C, ·, ·) stack — one channel SVD per realization — and the grid
    # runs C * tiles_per_realization programs.  A small shim class keeps
    # the loop body identical either way.
    if batched:
        class _T:       # noqa: N801 — ref-like view dropping the C axis
            def __init__(self, ref):
                self.ref = ref

            def __getitem__(self, _):
                return self.ref[0]

        taps = tuple(_T(r) for r in raw_taps)
        s2_ref = _T(s2_ref)   # (1, 1, p) block -> (1, p) view
    else:
        taps = raw_taps
    dot = make_dot(precision)
    noise_var = sigma2_ref[0]
    cap = cap_ref[0]
    init = (jnp.int32(0), act_ref[:], T_ref[:],
            rt_re_ref[:], rt_im_ref[:], s2t_ref[:],
            r_re_ref[:], r_im_ref[:], var_ref[:],
            xm_re_ref[:], xm_im_ref[:])

    def cond(c):
        return jnp.logical_and(c[0] < cap, jnp.sum(c[1]) > 0.0)

    def body(c):
        t, act, T, rt_re, rt_im, s2t, r_re, r_im, var, xm_re, xm_im = c
        # LMMSE stage in the SV domain (`vamp.py:66-73`).
        var_ratio = noise_var / s2t                          # (Bt, 1)
        if cmul == "gauss":
            # q = rt @ Vh^T: re = a@c - b@d, im = a@d + b@c via
            # k1=(a+b)@c, k2=a@(d-c), k3=b@(c+d).
            k1 = dot(rt_re + rt_im, taps[0][:])
            k2 = dot(rt_re, taps[1][:])
            k3 = dot(rt_im, taps[2][:])
            q_re, q_im = k1 - k3, k1 + k2                    # (Bt, p)
        else:
            q_re = dot(rt_re, taps[0][:]) - dot(rt_im, taps[1][:])
            q_im = dot(rt_re, taps[1][:]) + dot(rt_im, taps[0][:])
        scale = 1.0 / (s2_ref[:] + var_ratio)                # (Bt, p)
        xsv_re = scale * (yt_re_ref[:] + var_ratio * q_re)
        xsv_im = scale * (yt_im_ref[:] + var_ratio * q_im)
        var_lmmse = (dot(scale, jnp.ones((p, 1), jnp.float32))
                     / p * noise_var)                        # (Bt, 1)
        w_re, w_im = xsv_re - q_re, xsv_im - q_im
        # @ conj(Vh): re = a@c + b@d, im = b@c - a@d — the forward
        # identity with d -> -d: k1=(a+b)@c, k2=a@(-d-c), k3=b@(c-d).
        if cmul == "gauss":
            k1 = dot(w_re + w_im, taps[3][:])
            k2 = dot(w_re, taps[4][:])
            k3 = dot(w_im, taps[5][:])
            xt_re = k1 - k3 + rt_re                          # (Bt, N)
            xt_im = k1 + k2 + rt_im
        else:
            xt_re = (dot(w_re, taps[2][:]) + dot(w_im, taps[3][:])
                     + rt_re)                                # (Bt, N)
            xt_im = dot(w_im, taps[2][:]) - dot(w_re, taps[3][:]) + rt_im
        xt_var = eta * var_lmmse + (1.0 - eta) * s2t

        # Extrinsic subtraction (`vamp.py:75-82`).
        alpha = jnp.clip(xt_var / s2t, _VR_MIN, _VR_MAX)     # (Bt, 1)
        rn_re = (xt_re - alpha * rt_re) / (1.0 - alpha)
        rn_im = (xt_im - alpha * rt_im) / (1.0 - alpha)
        sig2_den = jnp.clip(alpha / (1.0 - alpha) * s2t, _VAR_MIN, _VAR_MAX)

        # Denoiser stage + extrinsic update (`vamp.py:84-94`); NO tau/2
        # halving (`vamp.py:110`).
        dn_re, dn_im, varn = _seg_denoiser_lanes(
            rn_re, rn_im, sig2_den, N=N, M=M, chunk=chunk,
            sym_re=sym_re, sym_im=sym_im, halve=False)
        dxdr = jnp.clip(dot(varn, jnp.ones((N, 1), jnp.float32)) / N
                        / sig2_den, _VR_MIN, _VR_MAX)
        norm = 1.0 / (1.0 - dxdr)
        rtn_re = (dn_re - dxdr * rn_re) * norm
        rtn_im = (dn_im - dxdr * rn_im) * norm
        s2tn = jnp.clip(sig2_den * dxdr * norm, _VAR_MIN, _VAR_MAX)

        # per-trial torch.allclose(var_new, var_old) (`vamp.py:181-186`)
        bad = (jnp.abs(varn - var)
               > 1e-8 + 1e-5 * jnp.abs(var)).astype(jnp.float32)
        notok = bad.sum(axis=1, keepdims=True)               # (Bt, 1)
        sel = lambda new, old: jnp.where(act > 0.0, new, old)
        return (t + 1,
                act * (notok > 0.0).astype(jnp.float32),
                T + act,
                sel(rtn_re, rt_re), sel(rtn_im, rt_im), sel(s2tn, s2t),
                sel(rn_re, r_re), sel(rn_im, r_im), sel(varn, var),
                sel(dn_re, xm_re), sel(dn_im, xm_im))

    c = jax.lax.while_loop(cond, body, init)
    _, act, T, rt_re, rt_im, s2t, r_re, r_im, var, xm_re, xm_im = c
    act_o[:] = act
    T_o[:] = T
    rt_re_o[:] = rt_re
    rt_im_o[:] = rt_im
    s2t_o[:] = s2t
    r_re_o[:] = r_re
    r_im_o[:] = r_im
    var_o[:] = var
    xm_re_o[:] = xm_re
    xm_im_o[:] = xm_im


def _pick_tile_vamp(B: int, N: int, p: int, K: int, M: int,
                    chunk: int, n_vh: int = 4) -> int:
    """Largest trial tile whose VMEM working set fits: ``n_vh`` resident
    split-real Vh planes (4 standard / 6 with the Gauss cmul combos) and
    the chunk-sized segment-indicator pair, plus the blocked (Bt, N)
    state/temporary planes (double-buffered when the grid has several
    programs)."""
    lane = lambda d: -(-d // 128) * 128
    half = n_vh // 2
    resident = (half * N * lane(p) * 4 + half * p * lane(N) * 4
                + 2 * chunk * lane(max(chunk // M, 1)) * 4)
    budget = 100 * 1024 * 1024 - resident
    # 11 while-carries in/out + the body's live (tile, N) temporaries.
    # With the Vh factors read from their refs inside the loop body (NOT
    # hoisted — hoisting made them loop-live register values and cost
    # 100.58M of spill slots) the footprint is state-plane dominated.
    # Calibrated: flagship tile=128 compile measured 146.94M total, i.e.
    # ~0.96 MB per trial row ≈ 94 plane-equivalents; tile=64 fits and
    # measured 8.9k trials/s vs 6.3k at tile=32 (matmul M = trial tile,
    # MXU sublane utilization scales with it).
    n_planes = 90 + 8 * K
    import os
    override = os.environ.get("AMP_VAMP_TILE")
    if override:
        t = int(override)
        if t <= 0 or B % t or t % 8:
            raise ValueError(f"AMP_VAMP_TILE={override} invalid for B={B}")
        return t
    for tile in (256, 128, 64, 32, 16, 8):
        if B % tile != 0:
            continue
        if n_planes * tile * lane(N) * 4 < budget:
            return tile
    return 0


class FusedVampDecode:
    """One ``pallas_call`` per VAMP decode on a fixed channel SVD."""

    @classmethod
    def covers(cls, cfg) -> bool:
        """Semantic coverage (segmented denoiser only; VAMP's random-mode
        Bernoulli-mixture path runs on XLA)."""
        return (cfg.mode in ("segmented", "sparc") and cfg.is_complex
                and cfg.M > 0)

    @classmethod
    def fits(cls, cfg, batch: int, batched: bool = False) -> bool:
        """VMEM trial-tile fit from config geometry — the constructor's
        own ``_pick_tile_vamp``/``_pick_chunk`` math (``batched`` uses
        the same budget; see the constructor note)."""
        import os
        N = cfg.Lin * cfg.Nt
        p = min(cfg.Lout * cfg.Nr, N)
        n_vh = 6 if os.environ.get("AMP_KERNEL_CMUL", "gauss") == "gauss" \
            else 4
        return _pick_tile_vamp(batch, N, p, cfg.K, cfg.M,
                               _pick_chunk(N, cfg.M), n_vh) > 0

    def __init__(self, Vh, batch: int, interpret: bool = False,
                 symbols=None, M: int = 0, chunk: int | None = None,
                 precision=jax.lax.Precision.HIGHEST):
        import os
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
        self.cmul = os.environ.get("AMP_KERNEL_CMUL", "gauss")
        # Realization-batched mode (Vh stacked (C, p, N)): one kernel
        # call decodes C realizations' trial batches; the grid walks
        # C * tiles_per_realization programs and each program's tap
        # blocks come from its realization's SVD.  This is the measured
        # workaround for the vmap-of-kernel compiler wedge
        # (models/montecarlo.py::sum_realizations) — realization
        # batching is "the better lever" for small-res VAMP workloads
        # (vamp.py svd docstring), and vmap cannot provide it.
        if Vh.ndim == 3:
            self.C = int(Vh.shape[0])
            p, N = Vh.shape[1], Vh.shape[2]
        else:
            self.C = 0              # 0 = unbatched call signature
            p, N = Vh.shape
        self.p, self.N = int(p), int(N)
        self.chunk = _pick_chunk(self.N, M) if chunk is None else chunk
        if self.N % self.chunk or self.chunk % M:
            raise ValueError("chunk must divide N and be a multiple of M")
        # Batched mode keeps the PLAIN tap budget: the doubled
        # (double-buffered) estimate dropped the tile to 32 and LOST 11%
        # (matmul M = tile), while the forced tile=64 compiled fine at
        # ~112MB — the pipeline only re-fetches tap blocks at the C-1
        # realization transitions, so the second buffer is transient.
        tile = _pick_tile_vamp(batch, self.N, self.p, len(syms), M,
                               self.chunk,
                               6 if self.cmul == "gauss" else 4)
        if tile == 0:
            raise NoVmemTileError(
                "no trial tile fits VMEM for this geometry")
        self.tile = tile
        Vh_re = jnp.real(Vh).astype(jnp.float32)
        Vh_im = jnp.imag(Vh).astype(jnp.float32)
        if self.C:
            tr = lambda a: jnp.swapaxes(a, -1, -2)
        else:
            tr = lambda a: a.T
        if self.cmul == "gauss":
            # forward taps on Vh^T: (c, d-c, c+d); backward on Vh with
            # d -> -d: (c, -d-c, c-d) — see _vamp_decode_kernel.
            self.taps = (tr(Vh_re), tr(Vh_im) - tr(Vh_re),
                         tr(Vh_re) + tr(Vh_im),
                         Vh_re, -Vh_im - Vh_re, Vh_re - Vh_im)
        else:
            self.taps = (tr(Vh_re), tr(Vh_im), Vh_re, Vh_im)

    def decode_call(self, sigma2, cap, act, T, rt_re, rt_im, s2t,
                    r_re, r_im, var, xm_re, xm_im, yt_re, yt_im, s2,
                    eta: float):
        """Run the full decode; state planes are plain (B, ·) float32.

        Returns ``(r_tilde_re, r_tilde_im, sigma2_tilde, r_re, r_im, var,
        xmmse_re, xmmse_im, act, T)``; all ten alias their inputs.

        Realization-batched mode (constructed with a (C, p, N) Vh
        stack): the state planes carry ``C * B_per`` realization-major
        rows, ``s2`` is the (C, p) squared-singular-value stack, and
        each grid program reads its own realization's tap blocks.
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
        if self.C:
            tpr = (B // self.C) // tile      # tiles per realization
            real = lambda i: (i // tpr, 0, 0)
            tapspec = [pl.BlockSpec((1,) + t.shape[1:], real,
                                    memory_space=pltpu.VMEM)
                       for t in self.taps]
            # s2 rides as (C, 1, p): Mosaic requires the LAST TWO block
            # dims to divide (8, 128) or equal the array dims, so the
            # realization axis must be a leading (freely blocked) dim.
            s2spec = pl.BlockSpec((1, 1, p), real,
                                  memory_space=pltpu.VMEM)
        else:
            tapspec = [full() for _ in self.taps]
            s2spec = full()
        n_shape = jax.ShapeDtypeStruct((B, N), jnp.float32)
        a_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
        kern = functools.partial(_vamp_decode_kernel, N=N, p=p, M=self.M,
                                 chunk=self.chunk, sym_re=self.sym_re,
                                 sym_im=self.sym_im, eta=float(eta),
                                 precision=self.precision, cmul=self.cmul,
                                 batched=bool(self.C))
        # inputs: 0 sigma2, 1 cap, 2 act, 3 T, 4 rt_re, 5 rt_im, 6 s2t,
        # 7 r_re, 8 r_im, 9 var, 10 xm_re, 11 xm_im, 12-13 y_tilde,
        # 14 s2, 15-18 Vh planes; outputs: 0-7 state, 8 act, 9 T
        aliases = {4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5, 10: 6, 11: 7,
                   2: 8, 3: 9}
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem(), smem(), aspec(), aspec()]
            + [nspec(), nspec(), aspec(), nspec(), nspec(), nspec(),
               nspec(), nspec()]
            + [pspec(), pspec(), s2spec] + tapspec,
            out_specs=[nspec(), nspec(), aspec(), nspec(), nspec(),
                       nspec(), nspec(), nspec(), aspec(), aspec()],
            out_shape=[n_shape, n_shape, a_shape, n_shape, n_shape,
                       n_shape, n_shape, n_shape, a_shape, a_shape],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=self.interpret,
        )(jnp.asarray(sigma2, jnp.float32).reshape(1),
          jnp.asarray(cap, jnp.int32).reshape(1), act, T,
          rt_re, rt_im, s2t, r_re, r_im, var, xm_re, xm_im,
          yt_re, yt_im,
          s2.reshape(self.C, 1, p) if self.C else s2, *self.taps)
