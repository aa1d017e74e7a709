"""SVD-form Vector AMP decoder (production variant, "adapted from prof.
Kuehn" in the reference).

Capability parity with ``/root/reference/vamp.py``: LMMSE stage in the
singular-value domain with scalar ``scale = 1/(s^2 + var_ratio)``
(`vamp.py:66-73`), extrinsic subtraction with alpha clipping to
``[1e-5, 1-1e-5]`` (`vamp.py:51-54,75-82`), the segmented softmax denoiser
WITHOUT the ``tau/2`` halving (`vamp.py:110` — commented out in the
reference), extrinsic update ``r_tilde = (xmmse - dxdr*r)/(1 - dxdr)``
(`vamp.py:89-94`), and ``allclose`` early stop on the posterior variance
(`vamp.py:181-186`).  The decision statistic handed to the metrics layer is
``r`` (the pseudo-data), as in `vamp.py:187`.

TPU-first design: trials are batched — all the scalar bookkeeping of the
reference (``sigma2_tilde``, ``alpha``, ``dxdr`` are scalars at the
reference's ``B=1``) becomes per-trial ``(B, 1)`` vectors so batching is
bit-equivalent to the reference's serial loop.  The SVD is computed once
per channel realization *outside* the decode (amortized over ``res`` trials
exactly like `vamp_model.py:56-58`) and the two remaining mat-vecs per
iteration run as batched MXU matmuls in the SV domain.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops import denoise
from .bamp import DecodeResult, _allclose_rows, _freeze

_VR_MIN = 1e-5          # `vamp.py:51-52`
_VR_MAX = 1.0 - _VR_MIN
_VAR_MIN = 1e-9         # `vamp.py:53-54`
_VAR_MAX = 1e5


class SVD(NamedTuple):
    """Economy SVD of the measurement matrix, ``A = U diag(s) Vh``."""

    U: jnp.ndarray      # (n, p)
    s: jnp.ndarray      # (p,) f32
    Vh: jnp.ndarray     # (p, N)


def svd(A: jnp.ndarray, method: str = "auto") -> SVD:
    """Economy SVD (`vamp_model.py:58`).

    ``method='gram'`` computes it from the small-side Gram
    eigendecomposition: for a wide ``(n, N)`` matrix, ``A A^H = U diag(s²)
    U^H`` via ``eigh`` of the (n, n) Hermitian Gram, then ``Vh = diag(1/s)
    U^H A``.  Measured on a v5e (flagship 528x2560 complex operator,
    vmapped x8 to amortize dispatch): direct 64 ms/SVD, gram 58 ms/SVD —
    a ~10% win only, since XLA:TPU's ``eigh`` (QDWH) costs nearly as much
    as its SVD; either way the SVD is ~25% of a res=2048 VAMP realization
    step, which is why ``chans_per_batch>1`` (vmapped realizations) is
    the better lever.  Relative accuracy of singular values below
    ``sqrt(eps)·s_max`` degrades (squared spectrum) — irrelevant for
    VAMP, whose LMMSE uses ``s²`` directly and is phase-invariant per
    singular vector, but FATAL for any consumer that divides by ``s``
    (vamp2's whitening ``y_tilde = (U^H y)/s``, `vamp2.py:22`): the
    gram route can return exact zeros where the direct SVD resolves tiny
    singular values.  Pass ``method='direct'`` for such consumers (the
    sweep engine does this for algo='vamp2').  ``'auto'`` picks 'gram'
    on TPU and the LAPACK-backed 'direct' elsewhere.
    """
    if method == "auto":
        method = "gram" if jax.default_backend() == "tpu" else "direct"
    if method == "direct":
        U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
        return SVD(U=U, s=s.astype(jnp.float32), Vh=Vh)
    n, N = A.shape
    if n <= N:
        G = jnp.matmul(A, jnp.conj(A).T,
                       precision=lax.Precision.HIGHEST)
        w, U = jnp.linalg.eigh(G)               # ascending
        w = jnp.maximum(w[::-1], 0.0)
        U = U[:, ::-1]
        s = jnp.sqrt(w)
        safe = jnp.maximum(s, s[0] * 1e-7 + 1e-30)
        Vh = jnp.matmul(jnp.conj(U).T, A,
                        precision=lax.Precision.HIGHEST) / safe[:, None]
        return SVD(U=U, s=s.astype(jnp.float32), Vh=Vh)
    G = jnp.matmul(jnp.conj(A).T, A, precision=lax.Precision.HIGHEST)
    w, V = jnp.linalg.eigh(G)
    w = jnp.maximum(w[::-1], 0.0)
    V = V[:, ::-1]
    s = jnp.sqrt(w)
    safe = jnp.maximum(s, s[0] * 1e-7 + 1e-30)
    U = jnp.matmul(A, V, precision=lax.Precision.HIGHEST) / safe[None, :]
    return SVD(U=U, s=s.astype(jnp.float32), Vh=jnp.conj(V).T)


class VAMPState(NamedTuple):
    r_tilde: jnp.ndarray       # (B, N) complex
    sigma2_tilde: jnp.ndarray  # (B, 1) f32
    r: jnp.ndarray             # (B, N) complex
    var: jnp.ndarray           # (B, N) f32
    xmmse: jnp.ndarray         # (B, N) complex
    active: jnp.ndarray
    T: jnp.ndarray
    t: jnp.ndarray


def make_denoiser(cfg: Config):
    symbols = jnp.asarray(cfg.symbols)
    if cfg.mode in ("segmented", "sparc"):
        return partial(denoise.segmented_posterior, symbols=symbols,
                       L=cfg.L, M=cfg.M, halve_tau=False,
                       variance="decomposed")
    # The reference's random-mode path is broken (its `random_denoiser`
    # returns no variance, `vamp.py:121-139`); we complete the capability
    # with the Bernoulli-mixture posterior incl. variance.
    return partial(denoise.bernoulli_mixture_posterior, symbols=symbols,
                   Ps=cfg.Ps, P0=cfg.P0)


def _fused_whole_decode(fused, s0: "VAMPState", y_tilde, s2_row, eta,
                        noise_var, cap) -> "VAMPState":
    """Run the entire VAMP decode as ONE pallas_call (in-kernel iteration
    loop; see :mod:`..ops.pallas.fused_vamp`)."""
    cap_rem = jnp.maximum(jnp.asarray(cap, jnp.int32) - s0.t, 0)
    act = s0.active.astype(jnp.float32)[:, None]
    T0 = s0.T.astype(jnp.float32)[:, None]
    out = fused.decode_call(
        noise_var, cap_rem, act, T0,
        jnp.real(s0.r_tilde), jnp.imag(s0.r_tilde), s0.sigma2_tilde,
        jnp.real(s0.r), jnp.imag(s0.r), s0.var,
        jnp.real(s0.xmmse), jnp.imag(s0.xmmse),
        jnp.real(y_tilde), jnp.imag(y_tilde), s2_row, eta)
    rt_re, rt_im, s2t, r_re, r_im, var, xm_re, xm_im, act_o, T_o = out
    active = act_o[:, 0] > 0.0
    T = T_o[:, 0].astype(jnp.int32)
    t = jnp.maximum(s0.t, jnp.where(jnp.any(active),
                                    jnp.asarray(cap, jnp.int32), T.max()))
    return VAMPState(
        r_tilde=lax.complex(rt_re, rt_im), sigma2_tilde=s2t,
        r=lax.complex(r_re, r_im), var=var,
        xmmse=lax.complex(xm_re, xm_im), active=active, T=T, t=t)


def decode(dec: SVD, y: jnp.ndarray, sigma2, cfg: Config,
           *, use_pallas: bool = False,
           state0: VAMPState | None = None,
           iter_cap: int | None = None,
           return_state: bool = False,
           precision=lax.Precision.HIGHEST):
    """Run VAMP on a batch of trials sharing one channel SVD.

    ``use_pallas`` runs the whole decode as one fused Pallas kernel with
    the SVD factor ``Vh`` VMEM-resident (complex segmented/sparc
    alphabets; falls back to the XLA path per-geometry when the working
    set cannot fit VMEM).

    ``state0`` / ``iter_cap`` / ``return_state`` make the decode resumable
    (identical trajectory when split at any cap — the basis of the sweep
    engine's continuation batching, as in :func:`.bamp.decode`).
    """
    B = y.shape[0]
    U, s, Vh = dec
    p, N = Vh.shape
    mm = partial(jnp.matmul, precision=precision)
    denoiser = make_denoiser(cfg)

    whole = None
    if use_pallas:
        import os

        from ..ops.pallas.fused_bamp import NoVmemTileError
        from ..ops.pallas.fused_vamp import FusedVampDecode

        if not FusedVampDecode.covers(cfg):
            # Honest knob: never silently run XLA under use_pallas=True.
            raise ValueError(
                "use_pallas: the fused VAMP kernel covers complex "
                f"segmented/sparc alphabets, not mode={cfg.mode!r} "
                f"is_complex={cfg.is_complex}")
        if os.environ.get("AMP_PALLAS_MODE", "whole") == "whole":
            try:
                whole = FusedVampDecode(
                    Vh, B, interpret=jax.default_backend() != "tpu",
                    symbols=cfg.symbols, M=cfg.M, precision=precision)
            except NoVmemTileError:
                whole = None

    s2 = (s ** 2)[None, :]                               # (1, p)
    eta = p / N                                          # `vamp.py:28`
    noise_var = jnp.asarray(sigma2, jnp.float32)
    y_tilde = s[None, :] * mm(y, jnp.conj(U))            # (B, p); `vamp.py:22`
    Vh_t = Vh.T                                          # r @ Vh_t == Vh @ r
    Vh_c = jnp.conj(Vh)                                  # w @ Vh_c == V @ w

    sparsity = cfg.sparsity
    s2t0 = sparsity ** 2 * (1 - sparsity) + (1 - sparsity) ** 2 * sparsity
    if state0 is None:
        state0 = VAMPState(
            r_tilde=jnp.full((B, N), sparsity, y.dtype),     # `vamp.py:25`
            sigma2_tilde=jnp.full((B, 1), s2t0, jnp.float32),
            r=jnp.zeros((B, N), y.dtype),
            var=jnp.ones((B, N), jnp.float32),
            xmmse=jnp.zeros((B, N), y.dtype),
            active=jnp.ones((B,), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    if whole is not None:
        st = _fused_whole_decode(whole, state0, y_tilde, s2, eta,
                                 noise_var, cap)
        result = DecodeResult(xmap=st.r, xmmse=st.xmmse, var=st.var,
                              T=st.T)
        if return_state:
            return result, st
        return result

    def cond(st: VAMPState):
        return jnp.logical_and(st.t < cap, jnp.any(st.active))

    def body(st: VAMPState) -> VAMPState:
        # LMMSE stage in the SV domain (`vamp.py:66-73`).
        var_ratio = noise_var / st.sigma2_tilde                  # (B, 1)
        q = mm(st.r_tilde, Vh_t)                                 # (B, p)
        scale = 1.0 / (s2 + var_ratio)                           # (B, p)
        x_sv = (scale * (y_tilde + var_ratio.astype(y.dtype) * q)
                ).astype(y.dtype)
        var_lmmse = scale.mean(axis=1, keepdims=True) * noise_var
        x_tilde = mm(x_sv - q, Vh_c) + st.r_tilde                # (B, N)
        x_tilde_var = eta * var_lmmse + (1.0 - eta) * st.sigma2_tilde

        # Extrinsic subtraction (`vamp.py:75-82`).
        alpha = jnp.clip(x_tilde_var / st.sigma2_tilde, _VR_MIN, _VR_MAX)
        r = (x_tilde - alpha.astype(y.dtype) * st.r_tilde) / (1.0 - alpha)
        sig2_den = jnp.clip(alpha / (1.0 - alpha) * st.sigma2_tilde,
                            _VAR_MIN, _VAR_MAX)

        # Denoiser stage + extrinsic update (`vamp.py:84-94`).
        xmmse, var = denoiser(r, sig2_den)
        dxdr = jnp.clip(var.mean(axis=1, keepdims=True) / sig2_den,
                        _VR_MIN, _VR_MAX)
        norm_scalar = 1.0 / (1.0 - dxdr)
        r_tilde = (xmmse - dxdr.astype(y.dtype) * r) * norm_scalar
        sigma2_tilde = jnp.clip(sig2_den * dxdr * norm_scalar,
                                _VAR_MIN, _VAR_MAX)

        converged = _allclose_rows(var, st.var)
        return VAMPState(
            r_tilde=_freeze(st.active, r_tilde, st.r_tilde),
            sigma2_tilde=_freeze(st.active, sigma2_tilde, st.sigma2_tilde),
            r=_freeze(st.active, r, st.r),
            var=_freeze(st.active, var, st.var),
            xmmse=_freeze(st.active, xmmse, st.xmmse),
            active=st.active & ~converged,
            T=jnp.where(st.active, st.t + 1, st.T),
            t=st.t + 1,
        )

    st = lax.while_loop(cond, body, state0)
    # `vamp.py:187` hands `r` (pseudo-data) to the decision layer.
    result = DecodeResult(xmap=st.r, xmmse=st.xmmse, var=st.var, T=st.T)
    if return_state:
        return result, st
    return result


def decode_batched(A_batch: jnp.ndarray, y_batch: jnp.ndarray, sigma2,
                   cfg: Config, *, precision=lax.Precision.HIGHEST,
                   svd_method: str = "auto"):
    """Decode ``C`` channel realizations' trial batches in ONE fused
    kernel call (realization-batched :class:`..ops.pallas.fused_vamp.
    FusedVampDecode`).

    ``A_batch`` is the (C, n, N) stack of measurement matrices,
    ``y_batch`` the (C, B, n) received trials.  The SVDs are vmapped XLA
    (fine under vmap — only ``pallas_call`` wedges the batcher, see
    ``montecarlo.sum_realizations``); the decode itself runs one grid of
    ``C * B/tile`` programs, each reading its own realization's
    VMEM-resident Vh tap blocks.  This is the measured lever for
    small-res VAMP workloads where per-realization kernel dispatches
    (the unrolled fallback) dominate.  Returns a per-realization
    :class:`DecodeResult` with leading axis ``C``.

    Trajectories are bit-identical to ``C`` separate ``use_pallas``
    decodes: the kernel body is unchanged — only which tap block a grid
    program reads differs.
    """
    from ..ops.pallas.fused_vamp import FusedVampDecode

    C, B, n = y_batch.shape
    N = A_batch.shape[2]
    dec = jax.vmap(lambda A: svd(A, method=svd_method))(A_batch)
    U, s, Vh = dec                                     # (C,n,p) (C,p) (C,p,N)
    p = Vh.shape[1]
    fused = FusedVampDecode(Vh, B, interpret=jax.default_backend() != "tpu",
                            symbols=cfg.symbols, M=cfg.M,
                            precision=precision)
    mm = partial(jnp.matmul, precision=precision)
    y_tilde = s[:, None, :] * mm(y_batch, jnp.conj(U))  # (C, B, p)
    s2 = (s ** 2)                                       # (C, p)
    eta = p / N
    noise_var = jnp.asarray(sigma2, jnp.float32)
    sparsity = cfg.sparsity
    s2t0 = sparsity ** 2 * (1 - sparsity) + (1 - sparsity) ** 2 * sparsity
    CB = C * B
    flat = lambda a: a.reshape((CB,) + a.shape[2:])
    dt = y_batch.dtype
    out = fused.decode_call(
        noise_var, jnp.asarray(cfg.N_Layers, jnp.int32),
        jnp.ones((CB, 1), jnp.float32), jnp.zeros((CB, 1), jnp.float32),
        jnp.full((CB, N), sparsity, jnp.float32), jnp.zeros((CB, N),
                                                            jnp.float32),
        jnp.full((CB, 1), s2t0, jnp.float32),
        jnp.zeros((CB, N), jnp.float32), jnp.zeros((CB, N), jnp.float32),
        jnp.ones((CB, N), jnp.float32),
        jnp.zeros((CB, N), jnp.float32), jnp.zeros((CB, N), jnp.float32),
        flat(jnp.real(y_tilde)), flat(jnp.imag(y_tilde)), s2, eta)
    rt_re, rt_im, s2t, r_re, r_im, var, xm_re, xm_im, act_o, T_o = out
    unflat = lambda a: a.reshape((C, B) + a.shape[1:])
    r = unflat(lax.complex(r_re, r_im)).astype(dt)
    xmmse = unflat(lax.complex(xm_re, xm_im)).astype(dt)
    return DecodeResult(xmap=r, xmmse=xmmse, var=unflat(var),
                        T=unflat(T_o[:, 0].astype(jnp.int32)))
