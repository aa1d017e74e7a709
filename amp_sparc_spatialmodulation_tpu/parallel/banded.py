"""Halo-exchange sequence-parallel BAMP on the banded (tap-form) operator.

This is the CP/SP analog for this workload (SURVEY §2a/§5): the frame of
``Lin`` channel uses is coupled only by the ``Lh``-tap band of the
block-Toeplitz channel (`/root/reference/channel.py:56-58`), so sharding
the frame over the ``model`` mesh axis needs only *boundary* exchange —
each AMP iteration communicates ``O(B * (Lh-1) * Nr)`` values between ring
neighbors instead of the ``O(B * n)`` full-vector psums of dense column
tensor-parallelism (:mod:`.tensor`).  Unlike the dense path it never
materializes the operator, so the massive-MIMO config (Nt=1344, Lin=32 —
0.93 GB dense) decodes under model parallelism with 4.6 MB of replicated
taps.

Layout (device ``d`` of ``k``, ``LinL = Lin/k``, ``R = LinL + Lh - 1``):

* x-side state (``xmap, xmmse, var``): column blocks
  ``[d*LinL, (d+1)*LinL)`` — flat ``(B, LinL*Nt)``, sliced from the global
  layout, segment boundaries never straddle shards.
* y-side state (``z, u, y``): local row-block slots ``[0, R)`` holding
  global row blocks ``[d*LinL, d*LinL + R)``.  Slots ``[0, LinL)`` are
  owned; the ``Lh-1`` overflow slots are owned only by the last device
  under ``tail`` truncation (they are the ISI transient rows,
  `channel.py:60-66`).  Non-owned slots are zero.

Per AMP iteration exactly two ``ppermute`` exchanges ride the ICI ring:

1. *forward*: partial sums of ``H @ xmmse`` and ``|H|^2 @ var`` that local
   columns contribute to the right neighbor's first ``Lh-1`` row blocks
   (wraps around the ring under ``cyclic`` truncation);
2. *backward*: the right neighbor's first ``Lh-1`` owned row blocks of the
   scaled residual ``(y - z)/u`` and ``1/u``, needed by the local columns'
   adjoint/covariance maps.

Numerics match :func:`..models.bamp.decode` on the same banded operator
exactly (same matmul shapes and accumulation order per column block).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..models.bamp import _allclose_rows, _freeze
from .mesh import MODEL_AXIS


def _right_perm(k: int, cyclic: bool):
    """Ring permutation d -> d+1 (wrapping only for cyclic truncation)."""
    if cyclic:
        return [(i, (i + 1) % k) for i in range(k)]
    return [(i, i + 1) for i in range(k - 1)]


def _left_perm(k: int, cyclic: bool):
    if cyclic:
        return [(i, (i - 1) % k) for i in range(k)]
    return [(i, i - 1) for i in range(1, k)]


class HaloBandedOperator:
    """This shard's view of a banded operator, with halo exchange.

    Built *inside* ``shard_map`` from the replicated taps; local geometry
    is derived from ``lax.axis_index``.

    Args:
        h: (Lh, Nr, Nt) replicated channel taps.
        gains: (Lh, Lin) replicated per-(tap, column-block) gains.
        cfg: system config (Lin, Lout, trunc geometry).
        axis_name: model mesh axis to shard the frame over.
    """

    def __init__(self, h: jnp.ndarray, gains: jnp.ndarray, cfg: Config,
                 axis_name: str = MODEL_AXIS,
                 precision=lax.Precision.HIGHEST):
        self.axis_name = axis_name
        self.k = lax.axis_size(axis_name)
        self.Lh, self.Nr, self.Nt = h.shape
        if cfg.Lin % self.k:
            raise ValueError(f"model axis size k={self.k} must divide "
                             f"Lin={cfg.Lin}")
        self.LinL = cfg.Lin // self.k
        if self.Lh - 1 > self.LinL:
            raise ValueError(f"halo Lh-1={self.Lh - 1} exceeds the local "
                             f"block count {self.LinL}; use fewer shards")
        self.R = self.LinL + self.Lh - 1
        self.trunc = cfg.trunc
        self.cyclic = cfg.trunc == "cyclic"
        self.precision = precision
        self.mm = partial(jnp.matmul, precision=precision)

        d = lax.axis_index(axis_name)
        self.is_last = d == self.k - 1
        # (Lh, LinL) local gain columns.
        self.g = lax.dynamic_slice_in_dim(gains, d * self.LinL, self.LinL,
                                          axis=1)
        self.g2 = self.g ** 2
        # Tap-stacked matmul forms (as ops.operators.BandedOperator).
        self.h_stack = h.transpose(2, 0, 1).reshape(self.Nt,
                                                    self.Lh * self.Nr)
        self.abs_h2_stack = jnp.abs(self.h_stack) ** 2
        # (R,) owned-slot mask: overflow slots are real rows only for the
        # last shard under 'tail' (and never a local responsibility under
        # 'cyclic'/'trunc', where Lout == Lin).
        base = jnp.arange(self.R) < self.LinL
        if cfg.trunc == "tail":
            self.owned = base | self.is_last
        else:
            self.owned = jnp.broadcast_to(base, (self.R,))
        self.owned_y = jnp.repeat(self.owned, self.Nr)   # (R*Nr,)

    # ---- local maps -----------------------------------------------------

    def _fwd_partial(self, x: jnp.ndarray, taps_stack: jnp.ndarray,
                     gains: jnp.ndarray) -> jnp.ndarray:
        """Local columns' contributions to row slots ``[0, R)``.

        x: (B, LinL*Nt) -> (B, R, Nr).  Slot of (local column c, tap l) is
        ``c + l`` — contiguous per tap, so the shift-accumulate is ``Lh``
        static slice-adds around one MXU matmul.
        """
        B = x.shape[0]
        P = self.mm(x.reshape(B * self.LinL, self.Nt), taps_stack)
        P = P.reshape(B, self.LinL, self.Lh, self.Nr)
        y = jnp.zeros((B, self.R, self.Nr), P.dtype)
        for l in range(self.Lh):
            y = y.at[:, l:l + self.LinL].add(
                gains[l][None, :, None] * P[:, :, l])
        return y

    def _bwd_local(self, w: jnp.ndarray, taps_stack: jnp.ndarray,
                   gains: jnp.ndarray) -> jnp.ndarray:
        """Adjoint onto local columns from the halo-complete row planes.

        w: (B, R, Nr) -> (B, LinL*Nt); conjugation is the caller's choice
        via ``taps_stack``.
        """
        B = w.shape[0]
        Z = jnp.stack([gains[l][None, :, None] * w[:, l:l + self.LinL]
                       for l in range(self.Lh)], axis=2)  # (B, LinL, Lh, Nr)
        r = self.mm(Z.reshape(B * self.LinL, self.Lh * self.Nr), taps_stack)
        return r.reshape(B, self.LinL * self.Nt)

    # ---- halo exchanges ---------------------------------------------------

    def exchange_forward(self, v: jnp.ndarray, hx: jnp.ndarray):
        """Complete owned rows of ``|H|^2 @ var`` and ``H @ xmmse``.

        Ships the ``Lh-1`` overflow-slot partials right, adds the left
        neighbor's into slots ``[0, Lh-1)``, zeroes non-owned slots.
        One ``ppermute`` of a stacked ``(B, Lh-1, 3*Nr)`` f32 buffer.
        """
        halo = self.Lh - 1
        if halo and (self.k > 1 or self.cyclic):
            buf = jnp.concatenate(
                [v[:, self.LinL:], hx[:, self.LinL:].real,
                 hx[:, self.LinL:].imag], axis=-1)
            recv = lax.ppermute(buf, self.axis_name,
                                _right_perm(self.k, self.cyclic))
            Nr = self.Nr
            v = v.at[:, :halo].add(recv[..., :Nr])
            hx = hx.at[:, :halo].add(
                lax.complex(recv[..., Nr:2 * Nr], recv[..., 2 * Nr:])
                if jnp.iscomplexobj(hx) else recv[..., Nr:2 * Nr])
        m = self.owned[None, :, None]
        return jnp.where(m, v, 0.0), jnp.where(m, hx, 0.0)

    def exchange_backward(self, uinv: jnp.ndarray, rr: jnp.ndarray):
        """Fill overflow slots with the right neighbor's first owned rows.

        ``uinv``/``rr`` must be zero outside owned slots.  Under ``tail``
        the last shard keeps its own (owned) overflow rows; under
        ``trunc`` the overflow rows don't exist and stay zero; under
        ``cyclic`` the exchange wraps.  One ``ppermute`` of a stacked
        ``(B, Lh-1, 3*Nr)`` f32 buffer.
        """
        halo = self.Lh - 1
        if not halo:
            return uinv, rr
        if self.k == 1 and not self.cyclic:
            return uinv, rr
        Nr = self.Nr
        buf = jnp.concatenate(
            [uinv[:, :halo], rr[:, :halo].real, rr[:, :halo].imag], axis=-1)
        recv = lax.ppermute(buf, self.axis_name,
                            _left_perm(self.k, self.cyclic))
        ru = recv[..., :Nr]
        rres = (lax.complex(recv[..., Nr:2 * Nr], recv[..., 2 * Nr:])
                if jnp.iscomplexobj(rr) else recv[..., Nr:2 * Nr])
        if self.trunc == "tail":
            keep = self.is_last       # last shard's overflow rows are owned
            ru = jnp.where(keep, uinv[:, self.LinL:], ru)
            rres = jnp.where(keep, rr[:, self.LinL:], rres)
        uinv = uinv.at[:, self.LinL:].set(ru)
        rr = rr.at[:, self.LinL:].set(rres)
        return uinv, rr

    # ---- the four decoder maps (shard-local results) ----------------------

    def apply_and_abs2(self, x: jnp.ndarray, var: jnp.ndarray):
        """(H @ x, |H|^2 @ var) on owned rows, one fused halo exchange.

        Returns two ``(B, R, Nr)`` planes, zero outside owned slots.
        """
        hx = self._fwd_partial(x, self.h_stack.astype(x.dtype), self.g)
        v = self._fwd_partial(var, self.abs_h2_stack, self.g2)
        v, hx = self.exchange_forward(v, hx)
        return hx, v

    def adj_and_cov(self, uinv: jnp.ndarray, rr: jnp.ndarray):
        """(H^H @ rr, 1/(|H|^2^T @ uinv)) for local columns.

        ``uinv``/``rr`` are owned-row planes; the halo exchange pulls the
        right neighbor's boundary rows first.
        """
        uinv, rr = self.exchange_backward(uinv, rr)
        cov = 1.0 / self._bwd_local(uinv, self.abs_h2_stack.T, self.g2)
        adj = self._bwd_local(rr, jnp.conj(self.h_stack).T.astype(rr.dtype),
                              self.g)
        return adj, cov


class HaloState(NamedTuple):
    xmap: jnp.ndarray    # (B, LinL*Nt) complex, column-local
    xmmse: jnp.ndarray   # (B, LinL*Nt) complex
    var: jnp.ndarray     # (B, LinL*Nt) f32
    z: jnp.ndarray       # (B, R, Nr) complex, owned rows (pads zero)
    u: jnp.ndarray       # (B, R, Nr) f32, owned rows (pads sigma2)
    active: jnp.ndarray  # (B,) bool
    alive: jnp.ndarray   # ()  bool — any trial active on ANY synced device
    T: jnp.ndarray       # (B,) int32
    t: jnp.ndarray


def shard_columns(full: jnp.ndarray, cfg: Config,
                  axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Slice this shard's channel-use columns of a (B, Lin*Nt) array."""
    k = lax.axis_size(axis_name)
    size = full.shape[-1] // k
    return lax.dynamic_slice_in_dim(full, lax.axis_index(axis_name) * size,
                                    size, axis=-1)


def shard_rows(y_full: jnp.ndarray, cfg: Config,
               axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Local (B, R, Nr) row planes of a replicated (B, Lout*Nr) array.

    Pads the global row dimension to ``Lin + Lh - 1`` blocks first so the
    slice never clamps (under ``trunc``/``cyclic`` the overflow rows don't
    exist and read as zero).
    """
    k = lax.axis_size(axis_name)
    B = y_full.shape[0]
    LinL = cfg.Lin // k
    R = LinL + cfg.Lh - 1
    blocks = y_full.reshape(B, cfg.Lout, cfg.Nr)
    pad = cfg.Lin + cfg.Lh - 1 - cfg.Lout
    if pad:
        blocks = jnp.pad(blocks, ((0, 0), (0, pad), (0, 0)))
    return lax.dynamic_slice_in_dim(blocks, lax.axis_index(axis_name) * LinL,
                                    R, axis=1)


def make_denoiser_local(cfg: Config, lin_local: int):
    """Shard-local denoiser (segments never straddle shards)."""
    from .tensor import make_denoiser_local as _mk
    return _mk(cfg, lin_local)


def decode(h: jnp.ndarray, gains: jnp.ndarray, y_local: jnp.ndarray,
           sigma2, cfg: Config, *, axis_name: str = MODEL_AXIS,
           sync_axes=None, precision=lax.Precision.HIGHEST):
    """Sequence-parallel BAMP (`bamp.py:48-64` semantics), frame sharded.

    Must run inside ``shard_map`` over a mesh with ``axis_name``.

    Args:
        h: (Lh, Nr, Nt) replicated taps.
        gains: (Lh, Lin) replicated gains (ones for Toeplitz,
            ``sqrt(W)`` band for SPARC).
        y_local: (B, R, Nr) local received rows (from :func:`shard_rows`).
        sigma2: scalar noise variance.
        sync_axes: ALL mesh axes whose devices run this program (defaults
            to ``(axis_name,)``).  The loop body issues collectives, so its
            trip count must be identical on every device of the program —
            the early-stop flag is psum-reduced over these axes (a device
            whose own trials converged keeps ticking with frozen state
            until the globally slowest trial converges).

    Returns ``(xmap_k, xmmse_k, var_k, T)``; column shards are
    ``all_gather``-able back to the global layout.
    """
    if sync_axes is None:
        sync_axes = (axis_name,)
    op = HaloBandedOperator(h, gains, cfg, axis_name=axis_name,
                            precision=precision)
    B = y_local.shape[0]
    N_local = op.LinL * op.Nt
    cdtype = y_local.dtype
    denoiser = make_denoiser_local(cfg, op.LinL)
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    mask_y = op.owned[None, :, None]
    y = jnp.where(mask_y, y_local, 0.0)

    state0 = HaloState(
        xmap=jnp.zeros((B, N_local), cdtype),
        xmmse=jnp.zeros((B, N_local), cdtype),
        var=jnp.ones((B, N_local), jnp.float32),
        z=y,
        u=jnp.full((B, op.R, op.Nr), sigma2, jnp.float32),
        active=jnp.ones((B,), bool),
        alive=jnp.ones((), bool),
        T=jnp.zeros((B,), jnp.int32),
        t=jnp.zeros((), jnp.int32),
    )

    def cond(s: HaloState):
        return jnp.logical_and(s.t < cfg.N_Layers, s.alive)

    def body(s: HaloState) -> HaloState:
        hx, v = op.apply_and_abs2(s.xmmse, s.var)         # owned rows
        z = hx - jnp.where(mask_y, v * (y - s.z) / s.u, 0.0).astype(cdtype)
        u = v + sigma2                                     # pads: sigma2 > 0
        uinv = jnp.where(mask_y, 1.0 / u, 0.0)
        rr = jnp.where(mask_y, (y - z) * uinv, 0.0).astype(cdtype)
        adj, cov = op.adj_and_cov(uinv, rr)                # local columns
        xmap = s.xmmse + cov * adj
        xmmse, var = denoiser(xmap, cov)
        local_ok = _allclose_rows(var, s.var)
        converged = lax.psum(local_ok.astype(jnp.int32), axis_name) == op.k
        active = s.active & ~converged
        # Uniform trip count across every device of the program: the body's
        # collectives must execute in lockstep mesh-wide.
        alive = lax.psum(jnp.any(active).astype(jnp.int32), sync_axes) > 0
        return HaloState(
            xmap=_freeze(s.active, xmap, s.xmap),
            xmmse=_freeze(s.active, xmmse, s.xmmse),
            var=_freeze(s.active, var, s.var),
            z=jnp.where(s.active[:, None, None], z, s.z),
            u=jnp.where(s.active[:, None, None], u, s.u),
            active=active,
            alive=alive,
            T=jnp.where(s.active, s.t + 1, s.T),
            t=s.t + 1,
        )

    s = lax.while_loop(cond, body, state0)
    return s.xmap, s.xmmse, s.var, s.T


def gather_columns(x_k: jnp.ndarray, axis_name: str = MODEL_AXIS):
    """All-gather column shards back to the full (B, N) array."""
    return lax.all_gather(x_k, axis_name, axis=1, tiled=True)
