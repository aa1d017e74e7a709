"""Tensor-parallel VAMP decode — SV-domain, frame columns sharded over the
``model`` mesh axis.

The reference's VAMP (`/root/reference/vamp.py:56-94`) is single-device:
it holds the full economy SVD ``A = U diag(s) Vh`` and iterates LMMSE /
denoiser stages over the full ``(B, N)`` state.  Here the ``N = Lin*Nt``
column (frame) dimension — the same dimension :mod:`.tensor` and
:mod:`.banded` shard for BAMP/SCAMP — is sharded over the ``model`` axis:
every device holds its ``(p, N/k)`` slab of ``Vh`` plus the replicated
``U``/``s``/``y_tilde``, and all per-element state (``r_tilde, r, var,
xmmse``) stays column-local.

Communication per AMP iteration (runs inside ``shard_map``, rides ICI):

* ``q = Vh @ r_tilde`` contracts over the sharded column dimension →
  one ``psum`` of the (B, p) SV-domain projection.
* ``V @ (x_sv - q)`` produces column-sharded output → no comm.
* The denoiser is segment-local (shards split at channel-use boundaries,
  ``Lin % model_size == 0``), and its Onsager mean ``dxdr = mean(var)``
  is a per-trial scalar → one tiny ``psum``.
* Convergence is a per-trial all-reduce of local allclose verdicts.

The SVD itself is NOT distributed: the sweep layer derives the channel
from a replicated key, so every shard computes the same (amortized over
``res`` trials, exactly the reference's strategy `vamp_model.py:56-58`)
SVD and slices its own columns.  What the model axis buys is per-element
state memory and the per-iteration matmul FLOPs — the O(B·N) terms —
scaling with the mesh, which is what grows in massive configs.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..models.vamp import _VAR_MAX, _VAR_MIN, _VR_MAX, _VR_MIN
from ..ops import denoise
from .mesh import MODEL_AXIS
from .tensor import _local_allclose, shard_columns  # noqa: F401 (re-export)


class VampTPState(NamedTuple):
    r_tilde: jnp.ndarray       # (B, N_local) complex
    sigma2_tilde: jnp.ndarray  # (B, 1) f32, replicated
    r: jnp.ndarray             # (B, N_local) complex (decision stat)
    var: jnp.ndarray           # (B, N_local) f32
    xmmse: jnp.ndarray         # (B, N_local) complex
    active: jnp.ndarray        # (B,)
    alive: jnp.ndarray         # () — any trial active on ANY synced device
    T: jnp.ndarray             # (B,)
    t: jnp.ndarray


def _freeze(mask, new, old):
    return jnp.where(mask[:, None] if new.ndim == 2 else mask, new, old)


def make_denoiser_local(cfg: Config, lin_local: int):
    """Shard-local denoiser with VAMP's calibration (no ``tau/2`` halving,
    `vamp.py:110` commented — see :func:`..models.vamp.make_denoiser`)."""
    symbols = jnp.asarray(cfg.symbols)
    if cfg.mode in ("segmented", "sparc"):
        return partial(denoise.segmented_posterior, symbols=symbols,
                       L=cfg.Na * lin_local, M=cfg.M, halve_tau=False,
                       variance="decomposed")
    return partial(denoise.bernoulli_mixture_posterior, symbols=symbols,
                   Ps=cfg.Ps, P0=cfg.P0)


def decode(U: jnp.ndarray, s: jnp.ndarray, Vh_k: jnp.ndarray,
           y: jnp.ndarray, sigma2, cfg: Config,
           *, axis_name: str = MODEL_AXIS, sync_axes=None,
           precision=lax.Precision.HIGHEST,
           state0: VampTPState | None = None,
           iter_cap: int | None = None,
           return_state: bool = False):
    """Tensor-parallel VAMP (`vamp.py:56-94` semantics) on a column shard.

    Args:
        U: (n, p) left singular vectors, replicated across the model axis.
        s: (p,) singular values, replicated.
        Vh_k: (p, N_local) — this shard's columns of ``Vh``.
        y: (B, n) received vectors, replicated.
        sync_axes: ALL mesh axes whose devices run this program (the body
            issues psums, so the trip count must match mesh-wide).
        state0 / iter_cap / return_state: resumable decoding as in
            :func:`..models.vamp.decode` (continuation batching).

    Returns ``(r_k, xmmse_k, var_k, T)`` — column-sharded pseudo-data
    (VAMP's decision statistic, `vamp.py:187`), posterior mean/variance,
    and per-trial iteration counts — or the final :class:`VampTPState`
    when ``return_state``.
    """
    if sync_axes is None:
        sync_axes = (axis_name,)
    B = y.shape[0]
    p, N_local = Vh_k.shape
    k = lax.axis_size(axis_name)
    N = N_local * k
    if cfg.Lin % k != 0:
        raise ValueError(
            f"model axis size k={k} must divide Lin={cfg.Lin}")
    mm = partial(jnp.matmul, precision=precision)
    denoiser = make_denoiser_local(cfg, cfg.Lin // k)
    psum = partial(lax.psum, axis_name=axis_name)
    cdtype = y.dtype

    s2 = (s ** 2)[None, :]                               # (1, p)
    eta = p / N                                          # `vamp.py:28`
    noise_var = jnp.asarray(sigma2, jnp.float32)
    y_tilde = s[None, :] * mm(y, jnp.conj(U))            # (B, p) replicated
    Vh_t = Vh_k.T                                        # (N_local, p)
    Vh_c = jnp.conj(Vh_k)                                # (p, N_local)

    sparsity = cfg.sparsity
    s2t0 = sparsity ** 2 * (1 - sparsity) + (1 - sparsity) ** 2 * sparsity
    if state0 is None:
        state0 = VampTPState(
            r_tilde=jnp.full((B, N_local), sparsity, cdtype),
            sigma2_tilde=jnp.full((B, 1), s2t0, jnp.float32),
            r=jnp.zeros((B, N_local), cdtype),
            var=jnp.ones((B, N_local), jnp.float32),
            xmmse=jnp.zeros((B, N_local), cdtype),
            active=jnp.ones((B,), bool),
            alive=jnp.ones((), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    def cond(st: VampTPState):
        return jnp.logical_and(st.t < cap, st.alive)

    def body(st: VampTPState) -> VampTPState:
        # LMMSE stage in the SV domain (`vamp.py:66-73`); the projection
        # contracts over the sharded columns -> one (B, p) all-reduce.
        var_ratio = noise_var / st.sigma2_tilde                  # (B, 1)
        q = psum(mm(st.r_tilde, Vh_t))                           # (B, p)
        scale = 1.0 / (s2 + var_ratio)                           # (B, p)
        x_sv = (scale * (y_tilde + var_ratio.astype(cdtype) * q)
                ).astype(cdtype)
        var_lmmse = scale.mean(axis=1, keepdims=True) * noise_var
        x_tilde = mm(x_sv - q, Vh_c) + st.r_tilde                # local
        x_tilde_var = eta * var_lmmse + (1.0 - eta) * st.sigma2_tilde

        # Extrinsic subtraction (`vamp.py:75-82`) — per-trial scalars.
        alpha = jnp.clip(x_tilde_var / st.sigma2_tilde, _VR_MIN, _VR_MAX)
        r = (x_tilde - alpha.astype(cdtype) * st.r_tilde) / (1.0 - alpha)
        sig2_den = jnp.clip(alpha / (1.0 - alpha) * st.sigma2_tilde,
                            _VAR_MIN, _VAR_MAX)

        # Denoiser stage + extrinsic update (`vamp.py:84-94`).  The
        # Onsager mean over N needs the cross-shard sum.
        xmmse, var = denoiser(r, sig2_den)
        var_mean = psum(var.sum(axis=1, keepdims=True)) / N
        dxdr = jnp.clip(var_mean / sig2_den, _VR_MIN, _VR_MAX)
        norm_scalar = 1.0 / (1.0 - dxdr)
        r_tilde = (xmmse - dxdr.astype(cdtype) * r) * norm_scalar
        sigma2_tilde = jnp.clip(sig2_den * dxdr * norm_scalar,
                                _VAR_MIN, _VAR_MAX)

        local_ok = _local_allclose(var, st.var)
        converged = psum(local_ok.astype(jnp.int32)) == k        # per-trial
        active = st.active & ~converged
        # Uniform trip count mesh-wide: the body's psums must execute in
        # lockstep on every device of the program.
        alive = lax.psum(jnp.any(active).astype(jnp.int32), sync_axes) > 0
        return VampTPState(
            r_tilde=_freeze(st.active, r_tilde, st.r_tilde),
            sigma2_tilde=_freeze(st.active, sigma2_tilde, st.sigma2_tilde),
            r=_freeze(st.active, r, st.r),
            var=_freeze(st.active, var, st.var),
            xmmse=_freeze(st.active, xmmse, st.xmmse),
            active=active,
            alive=alive,
            T=jnp.where(st.active, st.t + 1, st.T),
            t=st.t + 1,
        )

    st = lax.while_loop(cond, body, state0)
    if return_state:
        return st
    return st.r, st.xmmse, st.var, st.T
