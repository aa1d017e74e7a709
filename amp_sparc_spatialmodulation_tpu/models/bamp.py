"""Bayesian AMP decoder — pure-functional, batched, early-stopping.

Capability parity with the reference BAMP (``/root/reference/bamp.py``):
per-element-variance AMP with full Onsager correction (`bamp.py:48-64`), the
segmented softmax denoiser with its ``tau/2`` calibration (`bamp.py:66-77`)
or the i.i.d. Bernoulli-mixture denoiser in ``random`` mode
(`bamp.py:79-97`), iteration cap ``N_Layers`` with ``allclose`` early
stopping on the posterior variance (`bamp.py:136-141`), and the reported
iteration count ``t+1`` (`bamp.py:142`).

TPU-first design:

* State is an immutable pytree driven by ``lax.while_loop`` — one trace, no
  host round-trips inside the decode.
* Trials are batched: all state is ``(B, ·)`` and every mat-vec of the
  reference becomes a single ``(B, n) x (n, N)`` MXU matmul shared across
  the batch (the reference decodes ``B=1`` serially).
* Early stopping is per-trial: converged trials freeze (their state stops
  updating, preserving the reference's reported ``T`` semantics) while the
  rest of the batch keeps iterating; the loop exits when all trials have
  converged or the cap is reached.
* Matmul precision defaults to ``HIGHEST`` (f32 on the MXU) — AMP's
  convergence test is at 1e-5 relative tolerance, too tight for bf16 passes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops import denoise

# torch.allclose defaults (`bamp.py:140`)
_RTOL = 1e-5
_ATOL = 1e-8


class BAMPState(NamedTuple):
    xmap: jnp.ndarray    # (B, N) complex — pseudo-data r
    xmmse: jnp.ndarray   # (B, N) complex — posterior mean
    var: jnp.ndarray     # (B, N) f32    — posterior variance
    z: jnp.ndarray       # (B, n) complex — corrected residual
    u: jnp.ndarray       # (B, n) f32    — residual variance + sigma2
    active: jnp.ndarray  # (B,)  bool    — not yet converged
    T: jnp.ndarray       # (B,)  int32   — iterations run per trial
    t: jnp.ndarray       # ()    int32   — global iteration counter


class DecodeResult(NamedTuple):
    xmap: jnp.ndarray
    xmmse: jnp.ndarray
    var: jnp.ndarray
    T: jnp.ndarray       # (B,) int32 per-trial iterations (reference `t+1`)


def _allclose_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-trial ``torch.allclose(a, b)`` (`bamp.py:140`)."""
    return jnp.all(jnp.abs(a - b) <= _ATOL + _RTOL * jnp.abs(b), axis=-1)


def _freeze(mask, new, old):
    """Keep ``old`` for trials that already converged."""
    return jnp.where(mask[:, None] if new.ndim == 2 else mask, new, old)


class _PlaneState(NamedTuple):
    """BAMP state in the fused kernel's block-major split-real planes:
    x-side (Lin, B, Nt) f32, y-side (Lout, B, Nr) f32."""

    xmap_re: jnp.ndarray
    xmap_im: jnp.ndarray
    xm_re: jnp.ndarray
    xm_im: jnp.ndarray
    var: jnp.ndarray
    z_re: jnp.ndarray
    z_im: jnp.ndarray
    u: jnp.ndarray
    active: jnp.ndarray
    T: jnp.ndarray
    t: jnp.ndarray


def _fused_plane_loop(fused, s0: "BAMPState", y, sigma2, cap) -> "BAMPState":
    """Whole-iteration-fused decode with state kept in kernel layout.

    Converting (B, N) complex state to the kernel's split planes costs 8
    full-array transposes; doing that every iteration (as the generic
    ``__call__`` wrapper would) costs more than the kernel itself.  This
    loop converts once at entry and once at exit.
    """
    tx, ty = fused._to_x, fused._to_y
    y_re, y_im = ty(jnp.real(y)), ty(jnp.imag(y))
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    ps = _PlaneState(
        xmap_re=tx(jnp.real(s0.xmap)), xmap_im=tx(jnp.imag(s0.xmap)),
        xm_re=tx(jnp.real(s0.xmmse)), xm_im=tx(jnp.imag(s0.xmmse)),
        var=tx(s0.var),
        z_re=ty(jnp.real(s0.z)), z_im=ty(jnp.imag(s0.z)), u=ty(s0.u),
        active=s0.active, T=s0.T, t=s0.t)

    def cond(s: _PlaneState):
        return jnp.logical_and(s.t < cap, jnp.any(s.active))

    def body(s: _PlaneState) -> _PlaneState:
        # Per-trial freeze and the allclose residual count happen inside
        # the kernel (act mask + notok output); the six carried planes
        # update in-place via input/output aliasing.
        act = s.active.astype(jnp.float32)[:, None]
        out = fused.plane_call(sigma2, s.xm_re, s.xm_im, s.var,
                               s.z_re, s.z_im, s.u, y_re, y_im, act=act)
        xmap_re, xmap_im, xn_re, xn_im, varn, zr, zi, un, notok = out
        converged = notok.sum(axis=0)[:, 0] == 0.0
        fz = lambda new, old: jnp.where(s.active[None, :, None], new, old)
        return _PlaneState(
            xmap_re=fz(xmap_re, s.xmap_re), xmap_im=fz(xmap_im, s.xmap_im),
            xm_re=xn_re, xm_im=xn_im, var=varn,
            z_re=zr, z_im=zi, u=un,
            active=s.active & ~converged,
            T=jnp.where(s.active, s.t + 1, s.T),
            t=s.t + 1)

    s = lax.while_loop(cond, body, ps)
    cx = lambda re, im: lax.complex(fused._from_x(re), fused._from_x(im))
    return BAMPState(
        xmap=cx(s.xmap_re, s.xmap_im), xmmse=cx(s.xm_re, s.xm_im),
        var=fused._from_x(s.var),
        z=lax.complex(fused._from_y(s.z_re), fused._from_y(s.z_im)),
        u=fused._from_y(s.u), active=s.active, T=s.T, t=s.t)


def _fused_whole_decode(fused, s0: "BAMPState", y, sigma2, cap) -> "BAMPState":
    """Run the entire decode as ONE pallas_call (in-kernel iteration loop).

    One plane-layout conversion at entry and exit; per-trial T/active are
    carried in-kernel, so the result state is exactly what the XLA
    ``while_loop`` produces (and remains resumable for two-phase
    continuation batching — ``cap`` enters as the remaining budget)."""
    tx, ty = fused._to_x, fused._to_y
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    cap_rem = jnp.maximum(jnp.asarray(cap, jnp.int32) - s0.t, 0)
    act = s0.active.astype(jnp.float32)[:, None]
    T0 = s0.T.astype(jnp.float32)[:, None]
    out = fused.decode_call(
        sigma2, cap_rem, act, T0,
        tx(jnp.real(s0.xmap)), tx(jnp.imag(s0.xmap)),
        tx(jnp.real(s0.xmmse)), tx(jnp.imag(s0.xmmse)), tx(s0.var),
        ty(jnp.real(s0.z)), ty(jnp.imag(s0.z)), ty(s0.u),
        ty(jnp.real(y)), ty(jnp.imag(y)))
    xmap_re, xmap_im, xn_re, xn_im, varn, zr, zi, un, act_o, T_o = out
    active = act_o[:, 0] > 0.0
    T = T_o[:, 0].astype(jnp.int32)
    # Global counter semantics of the XLA loop: ran to cap if any trial is
    # still active, else stopped when the slowest trial froze.
    t = jnp.maximum(s0.t, jnp.where(jnp.any(active),
                                    jnp.asarray(cap, jnp.int32), T.max()))
    cx = lambda re, im: lax.complex(fused._from_x(re), fused._from_x(im))
    return BAMPState(
        xmap=cx(xmap_re, xmap_im), xmmse=cx(xn_re, xn_im),
        var=fused._from_x(varn),
        z=lax.complex(fused._from_y(zr), fused._from_y(zi)),
        u=fused._from_y(un), active=active, T=T, t=t)


def make_denoiser(cfg: Config):
    """Denoiser selected statically from config (`bamp.py:43-46`).

    The ``tau/2`` halving (`bamp.py:68`) is the complex-Gaussian
    calibration — ``exp(Re(r conj(s))/(tau/2)) = exp(2 Re(r conj(s))/tau)``
    matches ``exp(-|r-s|^2/tau)``.  For the real-valued channel mode the
    exact likelihood is ``exp(-(r-s)^2/(2 tau))``, i.e. NO halving (and a
    doubled covariance in the mixture form).
    """
    symbols = jnp.asarray(cfg.symbols)
    if cfg.mode in ("segmented", "sparc"):
        return partial(denoise.segmented_posterior, symbols=symbols,
                       L=cfg.L, M=cfg.M, halve_tau=cfg.is_complex,
                       variance="decomposed")
    if cfg.is_complex:
        return partial(denoise.bernoulli_mixture_posterior, symbols=symbols,
                       Ps=cfg.Ps, P0=cfg.P0)

    def real_denoiser(r, cov):
        return denoise.bernoulli_mixture_posterior(
            r, 2.0 * jnp.asarray(cov), symbols=symbols, Ps=cfg.Ps,
            P0=cfg.P0)

    return real_denoiser


def decode(H, y: jnp.ndarray, sigma2, cfg: Config,
           *, precision=lax.Precision.HIGHEST,
           use_pallas: bool = False,
           state0: BAMPState | None = None,
           iter_cap: int | None = None,
           return_state: bool = False):
    """Run BAMP on a batch of trials sharing one channel operator.

    Args:
        H: (n, N) measurement matrix, or any operator from
            :mod:`..ops.operators` (the banded tap-form operator makes the
            massive-MIMO config tractable).
        y: (B, n) received vectors.
        sigma2: scalar noise variance ``(Na/Nr)/SNR`` (`bamp.py:134`).
        cfg: static system config.
        use_pallas: run the linear part of each iteration as one fused
            Pallas kernel (requires a banded operator; falls back to
            interpret mode off-TPU).
        state0 / iter_cap / return_state: resumable decoding — start from a
            previous :class:`BAMPState`, stop at ``iter_cap`` iterations,
            and/or return the final state.  Splitting a decode at any cap
            and continuing yields the identical trajectory (the basis of
            the sweep engine's continuation batching, where the slow tail
            of a trial batch is compacted and finished separately).

    Returns:
        :class:`DecodeResult` with per-trial iteration counts (and the
        final :class:`BAMPState` when ``return_state``).
    """
    from ..ops import operators

    op = operators.as_operator(H, precision=precision)
    B = y.shape[0]
    n, N = op.shape
    cdtype = y.dtype
    denoiser = make_denoiser(cfg)

    fused = None
    whole = None
    if use_pallas:
        import os

        from ..ops.pallas.fused_bamp import (FusedBandedDecode,
                                             FusedBandedIteration,
                                             NoVmemTileError)

        if not isinstance(op, operators.BandedOperator):
            raise ValueError("use_pallas requires a BandedOperator")
        interpret = jax.default_backend() != "tpu"
        seg_ok = (cfg.mode in ("segmented", "sparc") and cfg.is_complex
                  and cfg.M > 0)
        mix_ok = cfg.mode == "random" and cfg.is_complex
        if not (seg_ok or mix_ok):
            # Honest knob: never silently run XLA under use_pallas=True.
            raise ValueError(
                "use_pallas: the fused BAMP kernels cover complex "
                f"segmented/sparc and random modes, not mode={cfg.mode!r} "
                f"is_complex={cfg.is_complex}")
        # The seg_ok/mix_ok predicate equals FusedBandedDecode.covers(cfg);
        # pinned by tests/test_pallas.py::test_covers_matches_decode_guard.
        # AMP_PALLAS_MODE=periter selects the one-kernel-per-iteration
        # design (A/B experiments); default is the whole-decode kernel.
        mode = os.environ.get("AMP_PALLAS_MODE", "whole")
        if mode == "whole":
            try:
                whole = FusedBandedDecode(
                    op, B, interpret=interpret, symbols=cfg.symbols,
                    M=cfg.M, precision=precision,
                    den="seg" if seg_ok else "mix",
                    Ps=cfg.Ps, P0=cfg.P0)
            except NoVmemTileError:
                whole = None
        if whole is None:
            # Per-iteration fusion: the in-kernel denoiser covers K=1
            # power-of-two-M alphabets (OOK).  Other alphabets get NO
            # per-iteration kernel — the linear-only form measured 0.89x
            # of the XLA banded path, so falling back to XLA is faster
            # than "using Pallas" (AMP_PALLAS_MODE=periter on a K>1
            # alphabet therefore measures the XLA path, by design).
            fuse_den = (seg_ok and cfg.K == 1
                        and (cfg.M & (cfg.M - 1)) == 0)
            if fuse_den:
                try:
                    fused = FusedBandedIteration(
                        op, B, interpret=interpret, fuse_denoiser=True,
                        symbols=cfg.symbols, M=cfg.M)
                except NoVmemTileError:
                    # Geometry doesn't fit a whole-frame VMEM trial tile
                    # (e.g. the massive Nt=1344 config) — try the
                    # FRAME-TILED per-iteration kernel (round 5); XLA
                    # banded covers anything it declines (complex
                    # alphabets, non-tail truncation, column-dependent
                    # gains).
                    fused = None
        if whole is None and fused is None and mode != "xla":
            from ..ops.pallas.fused_bamp_tiled import TiledBandedIteration
            try:
                fused = TiledBandedIteration(
                    op, B, interpret=interpret, symbols=cfg.symbols,
                    M=cfg.M, precision=precision)
            except (NoVmemTileError, ValueError):
                fused = None

    sigma2 = jnp.asarray(sigma2, jnp.float32)
    if state0 is None:
        state0 = BAMPState(
            xmap=jnp.zeros((B, N), cdtype),
            xmmse=jnp.zeros((B, N), cdtype),
            var=jnp.ones((B, N), jnp.float32),
            z=y,
            u=jnp.full((B, n), sigma2, jnp.float32),
            active=jnp.ones((B,), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    def cond(s: BAMPState):
        return jnp.logical_and(s.t < cap, jnp.any(s.active))

    if whole is not None:
        # Multi-iteration fusion: the entire while_loop runs inside ONE
        # pallas_call, each trial tile exiting at its own slowest trial.
        s = _fused_whole_decode(whole, state0, y, sigma2, cap)
        result = DecodeResult(xmap=s.xmap, xmmse=s.xmmse, var=s.var, T=s.T)
        if return_state:
            return result, s
        return result

    if fused is not None and fused.fuse_denoiser:
        # Plane-layout loop: state stays in the kernel's block-major split
        # planes across iterations — the (B, N) <-> plane transposes cost
        # more than the kernel itself when repeated every iteration.
        s = _fused_plane_loop(fused, state0, y, sigma2, cap)
        result = DecodeResult(xmap=s.xmap, xmmse=s.xmmse, var=s.var, T=s.T)
        if return_state:
            return result, s
        return result

    def body(s: BAMPState) -> BAMPState:
        # One AMP iteration (`bamp.py:59-64`).
        if fused is not None:
            xmap, cov, z, u = fused(s.xmmse, s.var, s.z, s.u, y, sigma2)
        else:
            v = op.apply_abs2(s.var)                             # (B, n)
            z = op.apply(s.xmmse) - (v * (y - s.z) / s.u).astype(cdtype)
            u = v + sigma2
            cov = 1.0 / op.apply_abs2T(1.0 / u)                  # (B, N)
            resid = ((y - z) / u).astype(cdtype)
            xmap = s.xmmse + cov * op.apply_adj(resid)
        xmmse, var = denoiser(xmap, cov)
        converged = _allclose_rows(var, s.var)
        return BAMPState(
            xmap=_freeze(s.active, xmap, s.xmap),
            xmmse=_freeze(s.active, xmmse, s.xmmse),
            var=_freeze(s.active, var, s.var),
            z=_freeze(s.active, z, s.z),
            u=_freeze(s.active, u, s.u),
            active=s.active & ~converged,
            T=jnp.where(s.active, s.t + 1, s.T),
            t=s.t + 1,
        )

    s = lax.while_loop(cond, body, state0)
    result = DecodeResult(xmap=s.xmap, xmmse=s.xmmse, var=s.var, T=s.T)
    if return_state:
        return result, s
    return result
