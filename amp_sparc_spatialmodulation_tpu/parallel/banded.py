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
        # A contribution travels at most ceil((Lh-1)/LinL) shards; when the
        # halo exceeds the local block count the exchange runs that many
        # hops (each hop re-ships the still-unowned overflow one shard on).
        self.hops = -(-(self.Lh - 1) // self.LinL) if self.Lh > 1 else 0
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

    def _ship_right(self, planes):
        """One multi-hop forward exchange of a list of (B, R, Nr) partial
        planes: each hop ships the still-unowned overflow slots one shard
        right (zeroing them locally — no double counting) and accumulates
        the received contributions into slots ``[0, halo)``.  One
        ``ppermute`` of the stacked real buffer per hop; ``hops =
        ceil((Lh-1)/LinL)`` covers halos wider than the local block count.
        """
        halo = self.Lh - 1
        if not halo or (self.k == 1 and not self.cyclic):
            return planes
        Nr = self.Nr
        perm = _right_perm(self.k, self.cyclic)
        reals = []
        for p in planes:   # split complex planes into re/im lanes
            if jnp.iscomplexobj(p):
                reals.extend([p.real, p.imag])
            else:
                reals.append(p)
        # Under 'tail' the LAST shard's overflow slots are its OWN rows
        # (the ISI transient): it has no right neighbor (non-cyclic perm
        # drops its send) and must keep them instead of zeroing.
        keep_ov = (self.is_last if self.trunc == "tail" and not self.cyclic
                   else jnp.zeros((), bool))
        for _ in range(self.hops):
            buf = jnp.concatenate([r[:, self.LinL:] for r in reals],
                                  axis=-1)
            reals = [r.at[:, self.LinL:].set(
                jnp.where(keep_ov, r[:, self.LinL:], 0.0)) for r in reals]
            recv = lax.ppermute(buf, self.axis_name, perm)
            reals = [r.at[:, :halo].add(recv[..., i * Nr:(i + 1) * Nr])
                     for i, r in enumerate(reals)]
        out, i = [], 0
        for p in planes:
            if jnp.iscomplexobj(p):
                out.append(lax.complex(reals[i], reals[i + 1]))
                i += 2
            else:
                out.append(reals[i])
                i += 1
        return out

    def _pull_right(self, planes):
        """Multi-hop backward exchange: fill overflow slots ``[LinL, R)``
        with the rows owned by the right neighbors (window improves every
        hop when the halo spans several shards).  Planes must be zero
        outside owned slots; under ``tail`` the last shard keeps its own
        (owned) overflow rows; under ``trunc`` the overflow rows don't
        exist and stay zero; under ``cyclic`` the pulls wrap."""
        halo = self.Lh - 1
        if not halo or (self.k == 1 and not self.cyclic):
            return planes
        Nr = self.Nr
        perm = _left_perm(self.k, self.cyclic)
        reals = []
        for p in planes:
            if jnp.iscomplexobj(p):
                reals.extend([p.real, p.imag])
            else:
                reals.append(p)
        keep = self.trunc == "tail"
        for _ in range(self.hops):
            buf = jnp.concatenate([r[:, :halo] for r in reals], axis=-1)
            recv = lax.ppermute(buf, self.axis_name, perm)
            nxt = []
            for i, r in enumerate(reals):
                win = recv[..., i * Nr:(i + 1) * Nr]
                if keep:   # last shard's overflow rows are its own
                    win = jnp.where(self.is_last, r[:, self.LinL:], win)
                nxt.append(r.at[:, self.LinL:].set(win))
            reals = nxt
        out, i = [], 0
        for p in planes:
            if jnp.iscomplexobj(p):
                out.append(lax.complex(reals[i], reals[i + 1]))
                i += 2
            else:
                out.append(reals[i])
                i += 1
        return out

    def exchange_forward(self, v: jnp.ndarray, hx: jnp.ndarray):
        """Complete owned rows of ``|H|^2 @ var`` and ``H @ xmmse``
        (stacked multi-hop ship; non-owned slots zeroed)."""
        v, hx = self._ship_right([v, hx])
        m = self.owned[None, :, None]
        return jnp.where(m, v, 0.0), jnp.where(m, hx, 0.0)

    def exchange_backward(self, uinv: jnp.ndarray, rr: jnp.ndarray):
        """Fill overflow slots with the right neighbors' owned rows of the
        scaled residual and ``1/u`` (stacked multi-hop pull)."""
        uinv, rr = self._pull_right([uinv, rr])
        return uinv, rr

    # ---- single-plane halo maps (SCAMP needs only A@x and A^H r) ----------

    def apply_halo(self, x: jnp.ndarray) -> jnp.ndarray:
        """``A @ x`` on owned rows — multi-hop forward halo exchange of one
        complex plane (`/root/reference/scamp.py:47` mat-vec)."""
        hx = self._fwd_partial(x, self.h_stack.astype(x.dtype), self.g)
        (hx,) = self._ship_right([hx])
        return jnp.where(self.owned[None, :, None], hx, 0.0)

    def adj_halo(self, rr: jnp.ndarray) -> jnp.ndarray:
        """``A^H @ rr`` for local columns (`scamp.py:53` mat-vec).

        ``rr`` must be zero outside owned slots; the backward multi-hop
        exchange pulls the right neighbors' owned rows into the overflow
        slots (the last shard keeps its own tail rows under ``tail``).
        """
        (rr,) = self._pull_right([rr])
        return self._bwd_local(rr, jnp.conj(self.h_stack).T.astype(rr.dtype),
                               self.g)

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
           sync_axes=None, precision=lax.Precision.HIGHEST,
           state0: HaloState | None = None, iter_cap: int | None = None,
           return_state: bool = False):
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
        state0 / iter_cap / return_state: resumable decoding, exactly as
            in :func:`..models.bamp.decode` — splitting a decode at any
            cap and continuing yields the identical trajectory (the basis
            of continuation batching on model-parallel meshes).

    Returns ``(xmap_k, xmmse_k, var_k, T)``, or the final
    :class:`HaloState` when ``return_state``; column shards are
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

    if state0 is None:
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
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    def cond(s: HaloState):
        return jnp.logical_and(s.t < cap, s.alive)

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
    if return_state:
        return s
    return s.xmap, s.xmmse, s.var, s.T


def gather_columns(x_k: jnp.ndarray, axis_name: str = MODEL_AXIS):
    """All-gather column shards back to the full (B, N) array."""
    return lax.all_gather(x_k, axis_name, axis=1, tiled=True)


# --------------------------------------------------------------------------
# Halo-parallel SCAMP (`/root/reference/scamp.py:43-59` semantics).
#
# The base-matrix bookkeeping (psi/phi/gma/tau) is tiny — (B, Lin)/(B, Lout)
# scalars per block — so it is computed REPLICATED on every shard from one
# all_gather of the (B, LinL) local section variances per iteration
# (O(B*Lin) floats on ICI).  Only the two big A mat-vecs are sharded, each
# with one single-plane halo ppermute, exactly like the BAMP halo decode.
# --------------------------------------------------------------------------


class HaloScampState(NamedTuple):
    xmap: jnp.ndarray    # (B, LinL*Nt) complex, column-local
    xmmse: jnp.ndarray   # (B, LinL*Nt) complex
    psi: jnp.ndarray     # (B, LinL) f32 local section variances
    phi: jnp.ndarray     # (B, Lout) f32 residual variances, REPLICATED
    z: jnp.ndarray       # (B, R, Nr) complex, owned rows (pads zero)
    active: jnp.ndarray  # (B,) bool
    alive: jnp.ndarray   # () bool
    T: jnp.ndarray       # (B,) int32
    t: jnp.ndarray


def _row_blocks_local(v_full: jnp.ndarray, cfg: Config, LinL: int,
                      axis_name: str = MODEL_AXIS) -> jnp.ndarray:
    """Local (B, R) row-block scalars of a replicated (B, Lout) array
    (block-scalar analog of :func:`shard_rows`)."""
    R = LinL + cfg.Lh - 1
    pad = cfg.Lin + cfg.Lh - 1 - cfg.Lout
    if pad:
        v_full = jnp.pad(v_full, ((0, 0), (0, pad)))
    return lax.dynamic_slice_in_dim(v_full, lax.axis_index(axis_name) * LinL,
                                    R, axis=1)


def scamp_decode(h: jnp.ndarray, gains: jnp.ndarray, W: jnp.ndarray,
                 y_local: jnp.ndarray, sigma2, cfg: Config, *,
                 estimate_phi: bool = False,
                 axis_name: str = MODEL_AXIS, sync_axes=None,
                 precision=lax.Precision.HIGHEST,
                 state0: "HaloScampState | None" = None,
                 iter_cap: int | None = None,
                 return_state: bool = False):
    """Sequence-parallel SCAMP, frame sharded over ``axis_name``.

    Must run inside ``shard_map``.  Args as :func:`decode` (incl. the
    resumable ``state0``/``iter_cap``/``return_state`` contract), plus the
    replicated base matrix ``W (Lout, Lin)``.  Matches the single-device
    :func:`..models.scamp.decode` trajectory exactly (same matmul shapes
    per column block, same per-trial T).

    ``estimate_phi`` enables the empirical residual variance of the
    reference's ``estSCAMP`` (`sparc.py:199`): per-block means of
    ``|z|^2``, psum-assembled across shards.
    """
    from ..ops import denoise

    if sync_axes is None:
        sync_axes = (axis_name,)
    op = HaloBandedOperator(h, gains, cfg, axis_name=axis_name,
                            precision=precision)
    B = y_local.shape[0]
    k = op.k
    LinL, R, Nr = op.LinL, op.R, op.Nr
    N_local = LinL * op.Nt
    cdtype = y_local.dtype
    Lc, Mc, Mr, L = cfg.Lc, cfg.Mc, cfg.Mr, cfg.L
    mm = partial(jnp.matmul, precision=precision)
    denoiser = partial(denoise.segmented_posterior,
                       symbols=jnp.asarray(cfg.symbols),
                       L=cfg.Na * LinL, M=cfg.M,
                       halve_tau=cfg.is_complex, variance=None)
    W = jnp.asarray(W, jnp.float32)
    Wt = W.T
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    mask_y = op.owned[None, :, None]       # (1, R, 1)
    mask_row = op.owned[None, :]           # (1, R)
    y = jnp.where(mask_y, y_local, 0.0)
    d = lax.axis_index(axis_name)

    if state0 is None:
        state0 = HaloScampState(
            xmap=jnp.zeros((B, N_local), cdtype),
            xmmse=jnp.zeros((B, N_local), cdtype),
            psi=jnp.ones((B, LinL), jnp.float32),
            phi=jnp.full((B, cfg.Lout), jnp.inf, jnp.float32),
            z=y,
            active=jnp.ones((B,), bool),
            alive=jnp.ones((), bool),
            T=jnp.zeros((B,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
    cap = cfg.N_Layers if iter_cap is None else iter_cap

    def cond(s: HaloScampState):
        return jnp.logical_and(s.t < cap, s.alive)

    def body(s: HaloScampState) -> HaloScampState:
        psi_full = lax.all_gather(s.psi, axis_name, axis=1, tiled=True)
        gma_full = mm(psi_full, Wt) / Lc                     # (B, Lout)
        b_loc = _row_blocks_local(gma_full / s.phi, cfg, LinL, axis_name)
        hx = op.apply_halo(s.xmmse)                          # (B, R, Nr)
        z = jnp.where(mask_y,
                      y - hx + b_loc[:, :, None].astype(cdtype) * s.z, 0.0)
        if estimate_phi:
            # `sparc.py:199`: per-output-block mean |z|^2, assembled
            # replicated from each shard's owned blocks.
            m_loc = (jnp.abs(z) ** 2).mean(axis=-1)          # (B, R)
            m_own = m_loc[:, :LinL]
            m_full = lax.all_gather(m_own, axis_name, axis=1, tiled=True)
            if cfg.trunc == "tail":
                tail = jnp.where(op.is_last, m_loc[:, LinL:], 0.0)
                m_full = jnp.concatenate(
                    [m_full, lax.psum(tail, axis_name)], axis=1)
            phi_full = m_full                                # (B, Lout)
        else:
            phi_full = sigma2 + gma_full                     # `scamp.py:50`
        tau_full = L / mm(1.0 / phi_full, W) / Mr            # (B, Lc)
        tau_loc = lax.dynamic_slice_in_dim(tau_full, d * LinL, LinL, axis=1)
        tau_use = _expand_cols(tau_loc, Mc)                  # (B, N_local)
        phi_loc = _row_blocks_local(phi_full, cfg, LinL, axis_name)
        phi_safe = jnp.where(mask_row, phi_loc, 1.0)
        rr = jnp.where(mask_y, (z / phi_safe[:, :, None]).astype(cdtype),
                       0.0)
        xmap = s.xmmse + tau_use * op.adj_halo(rr)
        xmmse, _ = denoiser(xmap, tau_use)
        psi = 1.0 - (jnp.abs(xmmse) ** 2).reshape(B, LinL, Mc).sum(-1) / cfg.Na

        local_ok = _allclose_rows(psi, s.psi)
        converged = lax.psum(local_ok.astype(jnp.int32), axis_name) == k
        active = s.active & ~converged
        alive = lax.psum(jnp.any(active).astype(jnp.int32), sync_axes) > 0
        return HaloScampState(
            xmap=_freeze(s.active, xmap, s.xmap),
            xmmse=_freeze(s.active, xmmse, s.xmmse),
            psi=_freeze(s.active, psi, s.psi),
            phi=_freeze(s.active, phi_full, s.phi),
            z=jnp.where(s.active[:, None, None], z, s.z),
            active=active,
            alive=alive,
            T=jnp.where(s.active, s.t + 1, s.T),
            t=s.t + 1,
        )

    s = lax.while_loop(cond, body, state0)
    if return_state:
        return s
    return s.xmap, s.xmmse, 1.0 - s.psi, s.T


def _expand_cols(v: jnp.ndarray, reps: int) -> jnp.ndarray:
    """``repeat_interleave`` along the last axis (`scamp.py:48,53-54`)."""
    B, L = v.shape
    return jnp.broadcast_to(v[:, :, None], (B, L, reps)).reshape(B, L * reps)
