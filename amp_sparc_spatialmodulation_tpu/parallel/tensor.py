"""Tensor-parallel BAMP decode — measurement-operator columns sharded over
the ``model`` mesh axis.

The reference has no model parallelism (its largest published config,
Nt=1344 / Lin=32, simply materializes a 2701x43008 dense matrix on one
device, SURVEY §2a).  Here the operator's columns — i.e. the *channel uses*
of the frame, since the operator is block-banded in that dimension — are
sharded over the ``model`` axis.  Because the column dimension is the
frame/sequence dimension, this is simultaneously the sequence-parallel
analog for this workload.

Communication pattern per AMP iteration (runs inside ``shard_map``):

* ``H @ xmmse`` and ``|H|^2 @ var`` contract over the sharded column
  dimension → one ``psum`` each over the ``model`` axis (rides ICI).
* ``H^H r`` and ``|H|^2^T u`` produce column-sharded outputs → no comm.
* The denoiser is segment-local: shards split at channel-use boundaries
  (``Lin % model_size == 0``), so segments never straddle shards.
* Convergence is a per-trial all-reduce of the local allclose verdicts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..ops import denoise
from .mesh import MODEL_AXIS

_RTOL = 1e-5
_ATOL = 1e-8


class TPState(NamedTuple):
    xmap: jnp.ndarray    # (B, N_local)
    xmmse: jnp.ndarray   # (B, N_local)
    var: jnp.ndarray     # (B, N_local)
    z: jnp.ndarray       # (B, n) replicated
    u: jnp.ndarray       # (B, n) replicated
    active: jnp.ndarray  # (B,)
    alive: jnp.ndarray   # () bool — any trial active on ANY synced device
    T: jnp.ndarray       # (B,)
    t: jnp.ndarray


def shard_columns(full: jnp.ndarray, cfg: Config, axis_name: str = MODEL_AXIS,
                  axis: int = -1) -> jnp.ndarray:
    """Slice this shard's channel-use block of a column-dimension array.

    Must be called inside ``shard_map``; requires ``Lin % axis_size == 0``.
    """
    k = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    size = full.shape[axis] // k
    return lax.dynamic_slice_in_dim(full, idx * size, size, axis=axis)


def _local_allclose(a, b):
    return jnp.all(jnp.abs(a - b) <= _ATOL + _RTOL * jnp.abs(b), axis=-1)


def _freeze(mask, new, old):
    return jnp.where(mask[:, None] if new.ndim == 2 else mask, new, old)


def make_denoiser_local(cfg: Config, lin_local: int):
    """Shard-local denoiser; same calibration as ``bamp.make_denoiser``
    (``tau/2`` only in the complex mode, doubled covariance in real
    ``random`` mode)."""
    symbols = jnp.asarray(cfg.symbols)
    if cfg.mode in ("segmented", "sparc"):
        return partial(denoise.segmented_posterior, symbols=symbols,
                       L=cfg.Na * lin_local, M=cfg.M,
                       halve_tau=cfg.is_complex, variance="decomposed")
    if cfg.is_complex:
        return partial(denoise.bernoulli_mixture_posterior, symbols=symbols,
                       Ps=cfg.Ps, P0=cfg.P0)

    def real_denoiser(r, cov):
        return denoise.bernoulli_mixture_posterior(
            r, 2.0 * jnp.asarray(cov), symbols=symbols, Ps=cfg.Ps, P0=cfg.P0)

    return real_denoiser


def decode(H_k: jnp.ndarray, y: jnp.ndarray, sigma2, cfg: Config,
           *, axis_name: str = MODEL_AXIS, sync_axes=None,
           precision=lax.Precision.HIGHEST,
           state0: TPState | None = None, iter_cap: int | None = None,
           return_state: bool = False):
    """Tensor-parallel BAMP (`bamp.py:48-64` semantics) on a column shard.

    Args:
        H_k: (n, N_local) — this shard's columns of the measurement matrix.
        y: (B, n) received vectors, replicated across the model axis.
        sync_axes: ALL mesh axes whose devices run this program (defaults
            to ``(axis_name,)``).  The loop body issues psums, so its trip
            count must be identical on every device mesh-wide; the
            early-stop flag is psum-reduced over these axes.
        state0 / iter_cap / return_state: resumable decoding, same contract
            as :func:`.banded.decode` — splitting at any cap and resuming
            yields the identical trajectory (continuation batching).

    Returns ``(xmap_k, xmmse_k, var_k, T)`` with column-sharded estimates,
    or the full :class:`TPState` when ``return_state``.
    """
    if sync_axes is None:
        sync_axes = (axis_name,)
    B = y.shape[0]
    n, N_local = H_k.shape
    k = lax.axis_size(axis_name)
    if cfg.Lin % k != 0:
        raise ValueError(f"Lin={cfg.Lin} must divide by model axis size {k}")
    mm = partial(jnp.matmul, precision=precision)
    denoiser = make_denoiser_local(cfg, cfg.Lin // k)
    psum = partial(lax.psum, axis_name=axis_name)

    Ht = H_k.T
    Hc = jnp.conj(H_k)
    abs2 = jnp.abs(H_k) ** 2
    abs2_t = abs2.T
    sigma2 = jnp.asarray(sigma2, jnp.float32)

    if state0 is None:
        state0 = TPState(
            xmap=jnp.zeros((B, N_local), H_k.dtype),
            xmmse=jnp.zeros((B, N_local), H_k.dtype),
            var=jnp.ones((B, N_local), jnp.float32),
            z=y,
            u=jnp.full((B, n), sigma2, jnp.float32),
            active=jnp.ones((B,), bool),
            alive=jnp.ones((), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    else:
        # A compacted sub-batch is alive iff any of ITS trials is active
        # (the stored flag reflects the pre-compaction batch mesh-wide).
        state0 = state0._replace(alive=lax.psum(
            jnp.any(state0.active).astype(jnp.int32), sync_axes) > 0)
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    def cond(s: TPState):
        return jnp.logical_and(s.t < cap, s.alive)

    def body(s: TPState) -> TPState:
        v = psum(mm(s.var, abs2_t))                       # (B, n) all-reduce
        Hx = psum(mm(s.xmmse, Ht))                        # (B, n) all-reduce
        z = Hx - (v * (y - s.z) / s.u).astype(y.dtype)
        u = v + sigma2
        cov = 1.0 / mm(1.0 / u, abs2)                     # local columns
        resid = ((y - z) / u).astype(y.dtype)
        xmap = s.xmmse + cov * mm(resid, Hc)              # local columns
        xmmse, var = denoiser(xmap, cov)
        local_ok = _local_allclose(var, s.var)
        converged = psum(local_ok.astype(jnp.int32)) == k  # per-trial
        active = s.active & ~converged
        # Uniform trip count mesh-wide: the body's psums must execute in
        # lockstep on every device of the program.
        alive = lax.psum(jnp.any(active).astype(jnp.int32), sync_axes) > 0
        return TPState(
            xmap=_freeze(s.active, xmap, s.xmap),
            xmmse=_freeze(s.active, xmmse, s.xmmse),
            var=_freeze(s.active, var, s.var),
            z=_freeze(s.active, z, s.z),
            u=_freeze(s.active, u, s.u),
            active=active,
            alive=alive,
            T=jnp.where(s.active, s.t + 1, s.T),
            t=s.t + 1,
        )

    s = lax.while_loop(cond, body, state0)
    if return_state:
        return s
    return s.xmap, s.xmmse, s.var, s.T


def gather_columns(x_k: jnp.ndarray, axis_name: str = MODEL_AXIS):
    """All-gather column shards back to the full (B, N) array."""
    return lax.all_gather(x_k, axis_name, axis=1, tiled=True)
