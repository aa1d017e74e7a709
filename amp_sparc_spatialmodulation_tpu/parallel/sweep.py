"""Sharded Monte-Carlo sweeps: trials data-parallel, optional model
(tensor/sequence) parallel decode, psum-reduced error statistics.

This is the distributed analog of ``Loss.accumulate`` (SURVEY §2a): every
device runs independent channel realizations and trial batches; the metric
sums (already additive, see :mod:`..utils.metrics`) are ``psum``-reduced
over the ``trials`` axis on ICI, and only finalized averages ever reach the
host.  With ``jax.distributed`` the same code spans hosts — DCN sees one
scalar pytree per SNR point.
"""
from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..models import bamp, montecarlo
from ..ops import channel as channel_ops
from ..ops import message as message_ops
from ..ops import operators
from ..utils import metrics
from . import banded, tensor, vamp_tp
from .mesh import MODEL_AXIS, TRIALS_AXIS


def make_sharded_step(cfg: Config, algo: str, channel_kind: str, res: int,
                      mesh: Mesh, chans_per_device: int = 1,
                      precision=lax.Precision.HIGHEST,
                      estimate_phi: bool = False,
                      operator_form: str = "auto",
                      use_pallas="auto"):
    """Build ``step(keys, snr) -> metric sums`` sharded over ``mesh``.

    ``keys`` has shape ``(trials_axis_size, chans_per_device, 2)`` — one key
    per (device, realization); every device decodes ``chans_per_device``
    realizations of ``res`` trials each.  When the mesh has a non-trivial
    ``model`` axis, each realization is decoded with the frame (column)
    dimension sharded over it: banded halo exchange for BAMP/SCAMP,
    dense column-TP for i.i.d. BAMP, SV-domain column sharding for VAMP
    (:mod:`.vamp_tp`).

    ``use_pallas`` applies per device on the data-parallel path (each
    device runs the fused whole-iteration kernel on its own trial batch);
    it does not compose with the model axis (the halo decode shards the
    frame the kernel keeps whole), so explicit ``True`` with ``model>1``
    raises.
    """
    tp = mesh.shape[MODEL_AXIS]
    if tp > 1 and algo not in ("bamp", "scamp", "vamp"):
        raise NotImplementedError(
            "model-axis sharding covers bamp (banded/dense), scamp "
            "(banded) and vamp (SV-domain columns); vamp2 divides by the "
            "small singular values and is not distributed")
    if tp > 1 and algo == "scamp" and channel_kind != "sparc":
        raise ValueError("scamp requires the sparc channel")
    if tp > 1 and use_pallas is True:
        raise ValueError("the fused Pallas kernel decodes whole frames; it "
                         "does not compose with the model axis (use "
                         "model=1 meshes for the fused kernel)")

    if tp == 1:
        realization = montecarlo.make_realization_fn(
            cfg, algo, channel_kind, res, precision=precision,
            estimate_phi=estimate_phi, operator_form=operator_form,
            use_pallas=use_pallas)

        def device_fn(keys, snr):
            if keys.shape[1] != chans_per_device:  # trace-time shape check
                raise ValueError(
                    f"keys carry {keys.shape[1]} realizations per device, "
                    f"step was built with chans_per_device="
                    f"{chans_per_device}")
            sums = montecarlo.sum_realizations(realization, keys[0], snr)
            return jax.tree_util.tree_map(
                lambda x: lax.psum(x, TRIALS_AXIS), sums)

        sharded = jax.shard_map(device_fn, mesh=mesh,
                                in_specs=(P(TRIALS_AXIS), P()),
                                out_specs=P(), check_vma=False)
        return jax.jit(sharded)

    # --- trials x model: model-parallel BAMP realization -------------------
    # Banded halo-exchange sequence parallelism whenever the channel has a
    # band structure (O(B*(Lh-1)*Nr) ppermutes per iteration, taps only);
    # dense column-TP with full psums remains for i.i.d. channels.

    if operator_form == "auto":
        operator_form = ("dense" if algo == "vamp" or channel_kind == "iid"
                         else "banded")
    if operator_form == "banded" and channel_kind == "iid":
        raise ValueError("iid channels have no banded form")
    if algo == "scamp" and operator_form != "banded":
        raise ValueError("model-parallel scamp needs the banded operator")
    if algo == "vamp" and operator_form != "dense":
        raise ValueError("model-parallel vamp works in the SV domain "
                         "(dense operator + SVD)")

    def tp_realization(key, snr):
        k_chan, k_msg, k_noise = jax.random.split(key, 3)
        sigma2 = cfg.E / snr
        # Channel/message/noise keys are replicated across the model axis,
        # so every shard derives the same realization and slices its own
        # columns.
        msg = message_ops.generate_message(k_msg, cfg, res)
        noise = channel_ops.awgn(k_noise, cfg, snr, res)
        if algo == "scamp":
            W_np = channel_ops.base_matrix(cfg)
            h = channel_ops.sample_sparc_taps(k_chan, cfg)
            gains = jnp.asarray(operators.sparc_gains(cfg, W_np))
            x_k = banded.shard_columns(msg.x, cfg)
            op = banded.HaloBandedOperator(h, gains, cfg,
                                           precision=precision)
            y_local = op.apply_halo(x_k) + banded.shard_rows(noise, cfg)
            xmap_k, xmmse_k, _, T = banded.scamp_decode(
                h, gains, jnp.asarray(W_np), y_local, sigma2, cfg,
                estimate_phi=estimate_phi,
                sync_axes=(TRIALS_AXIS, MODEL_AXIS), precision=precision)
            xmap = banded.gather_columns(xmap_k)
            xmmse = banded.gather_columns(xmmse_k)
        elif algo == "vamp":
            # Replicated channel + SVD (every shard derives the identical
            # realization from the replicated key — the SVD is amortized
            # over ``res`` trials exactly as in `vamp_model.py:56-58`),
            # then the SV-domain decode shards the frame columns.
            from ..models import vamp as vamp_mod
            if channel_kind == "sparc":
                _, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                A = channel_ops.generate_channel(k_chan, cfg)
            else:
                A = channel_ops.generate_as_random(k_chan, cfg)
            dec = vamp_mod.svd(A)
            y = jnp.matmul(msg.x, A.T, precision=precision) + noise
            Vh_k = tensor.shard_columns(dec.Vh, cfg)
            r_k, xmmse_k, _, T = vamp_tp.decode(
                dec.U, dec.s, Vh_k, y, sigma2, cfg,
                sync_axes=(TRIALS_AXIS, MODEL_AXIS), precision=precision)
            # `vamp.py:187`: the decision layer sees the pseudo-data r.
            xmap = tensor.gather_columns(r_k)
            xmmse = tensor.gather_columns(xmmse_k)
        elif operator_form == "banded":
            if channel_kind == "sparc":
                W = channel_ops.base_matrix(cfg)
                h = channel_ops.sample_sparc_taps(k_chan, cfg)
                gains = jnp.asarray(operators.sparc_gains(cfg, W))
            else:
                h = channel_ops.sample_taps(k_chan, cfg)
                gains = jnp.ones((cfg.Lh, cfg.Lin), jnp.float32)
            x_k = banded.shard_columns(msg.x, cfg)    # (B, N/tp)
            op = banded.HaloBandedOperator(h, gains, cfg,
                                           precision=precision)
            hx, _ = op.apply_and_abs2(
                x_k, jnp.zeros(x_k.shape, jnp.float32))
            y_local = hx + banded.shard_rows(noise, cfg)
            xmap_k, xmmse_k, _, T = banded.decode(
                h, gains, y_local, sigma2, cfg,
                sync_axes=(TRIALS_AXIS, MODEL_AXIS), precision=precision)
            xmap = banded.gather_columns(xmap_k)
            xmmse = banded.gather_columns(xmmse_k)
        else:
            if channel_kind == "sparc":
                _, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                A = channel_ops.generate_channel(k_chan, cfg)
            else:
                A = channel_ops.generate_as_random(k_chan, cfg)
            A_k = tensor.shard_columns(A, cfg)        # (n, N/tp)
            x_k = tensor.shard_columns(msg.x, cfg)    # (B, N/tp)
            y = (lax.psum(jnp.matmul(x_k, A_k.T, precision=precision),
                          MODEL_AXIS) + noise)
            xmap_k, xmmse_k, _, T = tensor.decode(
                A_k, y, sigma2, cfg,
                sync_axes=(TRIALS_AXIS, MODEL_AXIS), precision=precision)
            xmap = tensor.gather_columns(xmap_k)
            xmmse = tensor.gather_columns(xmmse_k)
        return metrics.evaluate_sums(xmap, xmmse, msg, T, cfg)

    def device_fn(keys, snr):
        sums = jax.vmap(lambda k: tp_realization(k, snr))(keys[0])
        sums = jax.tree_util.tree_map(lambda x: x.sum(axis=0), sums)
        # Sums are identical across the model axis; psum over both axes and
        # divide by the model size to de-duplicate.
        return jax.tree_util.tree_map(
            lambda x: lax.psum(x, (TRIALS_AXIS, MODEL_AXIS)) / tp, sums)

    sharded = jax.shard_map(device_fn, mesh=mesh,
                            in_specs=(P(TRIALS_AXIS), P()),
                            out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def _tree_idx(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


class ShardedTwoPhaseFns(NamedTuple):
    """The jitted sharded continuation-batching functions plus the mesh's
    model-axis size — the host orchestration keys its de-duplication on
    this builder-recorded flag, never on array ranks (a future 3-dim
    trials-only ``active`` layout must not be misread as model-parallel).
    """

    phase1: Callable
    phase23: Callable
    eval_all: Callable
    model_size: int
    phase123_for: Optional[Callable] = None  # bucket -> jitted program


def make_sharded_two_phase_fns(cfg: Config, algo: str, channel_kind: str,
                               res: int, k1: int, mesh: Mesh,
                               chans_per_device: int = 1,
                               precision=lax.Precision.HIGHEST,
                               operator_form: str = "auto",
                               estimate_phi: bool = False,
                               use_pallas="auto"):
    """Continuation batching over the ``trials`` mesh axis.

    Phase 1 decodes ``chans_per_device`` realizations per device capped at
    ``k1`` iterations; the host reads only the (small) per-trial ``active``
    masks, builds one padded tail bucket per realization (a common bucket
    size keeps the mesh program uniform), and phase 2 finishes every
    device's own tail in place — no cross-device state movement, only the
    final metric psum rides the ICI.  Per-realization trajectories are
    bit-identical to the single-device :class:`..models.montecarlo`
    two-phase path (same keys → same decode); only the float reduction
    order of the metric sums differs.

    Returns ``(phase1, phase23, eval_all, model_size)``:
      phase1(keys, snr) -> (y, state), leading dim D*C, sharded
      phase23(keys, pad_idx, y, state, snr) -> psum-reduced sums
      eval_all(keys, state) -> psum-reduced sums (no-tail fast path)

    The ground-truth message never crosses phases — it is regenerated
    from the keys at evaluation time (see
    :func:`..models.montecarlo.make_two_phase_core`).

    On a mesh with a non-trivial ``model`` axis the decode itself is
    model-parallel (halo BAMP/SCAMP, SV-domain VAMP) and the tail
    compaction selects TRIAL rows — identical on every model shard, since
    convergence is psum-reduced — so continuation batching composes with
    frame sharding too (:func:`_make_tp_two_phase_fns`).
    """
    if mesh.shape[MODEL_AXIS] > 1:
        return _make_tp_two_phase_fns(
            cfg, algo, channel_kind, res, k1, mesh,
            chans_per_device=chans_per_device, precision=precision,
            operator_form=operator_form, estimate_phi=estimate_phi,
            use_pallas=use_pallas)
    core = montecarlo.make_two_phase_core(
        cfg, algo, channel_kind, res, k1, precision=precision,
        operator_form=operator_form, estimate_phi=estimate_phi,
        use_pallas=use_pallas)
    C = chans_per_device

    def map_c(fn, *trees):
        """vmap over the device-local realization axis — unrolled when the
        fused Pallas kernel is on (pallas_call with aliasing doesn't batch
        reliably under vmap)."""
        if core.use_pallas:
            outs = [fn(*(_tree_idx(t, i) for t in trees)) for i in range(C)]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
        return jax.vmap(fn)(*trees)

    def p1_dev(keys, snr):
        if keys.shape[1] != C:  # trace-time shape check
            raise ValueError(
                f"keys carry {keys.shape[1]} realizations per device, "
                f"fns were built with chans_per_device={C}")
        return map_c(lambda k: core.phase1(k, snr), keys[0])

    def p23_dev(keys, pad_idx, y, state, snr):
        def one(k, pidx, y_c, st_c):
            sub = montecarlo.state_take_trials(st_c, pidx)
            s_fin = core.phase2(k, y_c[pidx], sub, snr)
            return core.scatter_eval(k, st_c, s_fin, pidx)

        sums = map_c(one, keys[0], pad_idx, y, state)
        sums = jax.tree_util.tree_map(lambda x: x.sum(axis=0), sums)
        return jax.tree_util.tree_map(
            lambda x: lax.psum(x, TRIALS_AXIS), sums)

    def eval_dev(keys, state):
        sums = jax.vmap(core.evaluate)(keys[0], state)
        sums = jax.tree_util.tree_map(lambda x: x.sum(axis=0), sums)
        return jax.tree_util.tree_map(
            lambda x: lax.psum(x, TRIALS_AXIS), sums)

    T = TRIALS_AXIS
    phase1 = jax.jit(jax.shard_map(
        p1_dev, mesh=mesh, in_specs=(P(T), P()), out_specs=P(T),
        check_vma=False))
    phase23 = jax.jit(jax.shard_map(
        p23_dev, mesh=mesh,
        in_specs=(P(T), P(T), P(T), P(T), P()), out_specs=P(),
        check_vma=False), donate_argnums=(3,))
    eval_all = jax.jit(jax.shard_map(
        eval_dev, mesh=mesh, in_specs=(P(T), P(T)), out_specs=P(),
        check_vma=False), donate_argnums=(1,))

    # Single-program realizations (round 5): each device runs its C
    # realizations end to end with the static-bucket in-graph gather
    # (montecarlo.make_two_phase_core.phase123) and only the psum-reduced
    # sums cross the mesh — the per-realization active-mask fetch
    # disappears exactly as on the single-device path.
    p123_cache: dict = {}

    def phase123_for(bucket: int):
        if bucket not in p123_cache:
            def p123_dev(keys, snr):
                sums = map_c(
                    lambda k: core.phase123(k, snr, bucket=bucket),
                    keys[0])
                sums = jax.tree_util.tree_map(lambda x: x.sum(axis=0),
                                              sums)
                return jax.tree_util.tree_map(
                    lambda x: lax.psum(x, TRIALS_AXIS), sums)

            p123_cache[bucket] = jax.jit(jax.shard_map(
                p123_dev, mesh=mesh, in_specs=(P(T), P()), out_specs=P(),
                check_vma=False))
        return p123_cache[bucket]

    return ShardedTwoPhaseFns(phase1, phase23, eval_all, model_size=1,
                              phase123_for=phase123_for)


def _make_tp_two_phase_fns(cfg: Config, algo: str, channel_kind: str,
                           res: int, k1: int, mesh: Mesh,
                           chans_per_device: int = 1,
                           precision=lax.Precision.HIGHEST,
                           operator_form: str = "auto",
                           estimate_phi: bool = False,
                           use_pallas="auto"):
    """Continuation batching on a ``(trials, model)`` mesh.

    The decode is model-parallel (halo BAMP/SCAMP on the tap-form
    operator, SV-domain column-sharded VAMP); phase 1 stops at ``k1``
    iterations and returns the column-sharded decoder state with TWO
    leading stacked dims ``(trials, model)``.  The host reads only the
    per-trial ``active`` masks (replicated across model shards — the
    convergence verdict is psum-reduced), builds one padded tail bucket
    per trials-device, and phase 2 resumes every shard's own column slab
    of exactly those trials — the compaction never moves state across the
    model axis because it selects trial ROWS, which every model shard
    stores identically-indexed.

    Same ``(phase1, phase23, eval_all)`` contract and host orchestration
    (:func:`run_sharded_two_phase`) as the trials-only path.
    """
    from ..models import vamp as vamp_mod

    tp = mesh.shape[MODEL_AXIS]
    if algo not in ("bamp", "scamp", "vamp"):
        raise NotImplementedError(
            "model-axis two-phase covers bamp, scamp and vamp")
    if chans_per_device != 1:
        raise NotImplementedError(
            "model-axis two-phase runs one realization per device call "
            "(chans_per_device=1)")
    if use_pallas is True:
        raise ValueError("the fused Pallas kernel decodes whole frames; "
                         "it does not compose with the model axis")
    if operator_form == "auto":
        operator_form = ("dense" if algo == "vamp" or channel_kind == "iid"
                         else "banded")
    if algo == "vamp" and operator_form != "dense":
        raise ValueError("model-parallel vamp works in the SV domain")
    if algo == "scamp" and operator_form != "banded":
        raise ValueError("model-parallel scamp needs the banded operator")
    if operator_form == "banded" and channel_kind == "iid":
        raise ValueError("iid channels have no banded form")
    if algo == "scamp" and channel_kind != "sparc":
        raise ValueError("scamp requires the sparc channel")
    sync = (TRIALS_AXIS, MODEL_AXIS)

    def build_ctx(k_chan):
        """Operator data for one realization, derived from the replicated
        key (phase 2 rebuilds it instead of round-tripping it)."""
        if algo == "vamp":
            if channel_kind == "sparc":
                _, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                A = channel_ops.generate_channel(k_chan, cfg)
            else:
                A = channel_ops.generate_as_random(k_chan, cfg)
            return (A, vamp_mod.svd(A))
        if operator_form == "dense":
            # Dense column-TP (i.i.d. or materialized Toeplitz/SPARC):
            # every model shard derives the full A from the replicated key
            # and slices its own columns, exactly like the single-phase
            # step.
            if channel_kind == "sparc":
                _, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                A = channel_ops.generate_channel(k_chan, cfg)
            else:
                A = channel_ops.generate_as_random(k_chan, cfg)
            return (A,)
        if channel_kind == "sparc":
            W_np = channel_ops.base_matrix(cfg)
            h = channel_ops.sample_sparc_taps(k_chan, cfg)
            gains = jnp.asarray(operators.sparc_gains(cfg, W_np))
            return (h, gains, jnp.asarray(W_np, jnp.float32))
        h = channel_ops.sample_taps(k_chan, cfg)
        return (h, jnp.ones((cfg.Lh, cfg.Lin), jnp.float32), None)

    def build_y(ctx, msg, noise):
        """The received signal exactly as the single-phase TP step forms
        it (same fp op order -> identical trajectories)."""
        if algo == "vamp":
            A = ctx[0]
            return jnp.matmul(msg.x, A.T, precision=precision) + noise
        if operator_form == "dense":
            # Same fp op order as the single-phase dense-TP step: local
            # partial products psum-reduced over the model axis.
            A_k = tensor.shard_columns(ctx[0], cfg)
            x_k = tensor.shard_columns(msg.x, cfg)
            return (lax.psum(jnp.matmul(x_k, A_k.T, precision=precision),
                             MODEL_AXIS) + noise)
        h, gains, _ = ctx
        x_k = banded.shard_columns(msg.x, cfg)
        op = banded.HaloBandedOperator(h, gains, cfg, precision=precision)
        if algo == "scamp":
            return op.apply_halo(x_k) + banded.shard_rows(noise, cfg)
        hx, _ = op.apply_and_abs2(x_k, jnp.zeros(x_k.shape, jnp.float32))
        return hx + banded.shard_rows(noise, cfg)

    def tp_decode(ctx, y, sigma2, state0, iter_cap):
        if algo == "bamp" and operator_form == "dense":
            A_k = tensor.shard_columns(ctx[0], cfg)
            return tensor.decode(A_k, y, sigma2, cfg, sync_axes=sync,
                                 precision=precision, state0=state0,
                                 iter_cap=iter_cap, return_state=True)
        if algo == "bamp":
            h, gains, _ = ctx
            return banded.decode(h, gains, y, sigma2, cfg, sync_axes=sync,
                                 precision=precision, state0=state0,
                                 iter_cap=iter_cap, return_state=True)
        if algo == "scamp":
            h, gains, W = ctx
            return banded.scamp_decode(
                h, gains, W, y, sigma2, cfg, estimate_phi=estimate_phi,
                sync_axes=sync, precision=precision, state0=state0,
                iter_cap=iter_cap, return_state=True)
        dec = ctx[1]
        Vh_k = tensor.shard_columns(dec.Vh, cfg)
        return vamp_tp.decode(dec.U, dec.s, Vh_k, y, sigma2, cfg,
                              sync_axes=sync, precision=precision,
                              state0=state0, iter_cap=iter_cap,
                              return_state=True)

    def pack(tree):
        """Add the (trials, model) stacking dims shard_map assembles."""
        return jax.tree_util.tree_map(lambda a: a[None, None], tree)

    def unpack(tree):
        return jax.tree_util.tree_map(lambda a: a[0, 0], tree)

    def eval_from_state(key, st):
        if algo == "vamp":
            stat = tensor.gather_columns(st.r)
            xmmse = tensor.gather_columns(st.xmmse)
        else:
            stat = banded.gather_columns(st.xmap)
            xmmse = banded.gather_columns(st.xmmse)
        _, k_msg, _ = jax.random.split(key, 3)
        msg = message_ops.generate_message(k_msg, cfg, res)
        sums = metrics.evaluate_sums(stat, xmmse, msg, st.T, cfg)
        # Sums are identical across the model axis; psum over both axes
        # and de-duplicate (same reduction as the single-phase TP step).
        return jax.tree_util.tree_map(
            lambda x: lax.psum(x, sync) / tp, sums)

    def p1_dev(keys, snr):
        k_chan, k_msg, k_noise = jax.random.split(keys[0, 0], 3)
        sigma2 = cfg.E / snr
        msg = message_ops.generate_message(k_msg, cfg, res)
        noise = channel_ops.awgn(k_noise, cfg, snr, res)
        ctx = build_ctx(k_chan)
        y = build_y(ctx, msg, noise)
        st = tp_decode(ctx, y, sigma2, None, k1)
        return y[None, None], pack(st)

    def p23_dev(keys, pad_idx, y, state, snr):
        k_chan, _, _ = jax.random.split(keys[0, 0], 3)
        sigma2 = cfg.E / snr
        pidx = pad_idx[0]
        y_l, st = y[0, 0], unpack(state)
        ctx = build_ctx(k_chan)
        sub = montecarlo.state_take_trials(st, pidx)
        s_fin = tp_decode(ctx, y_l[pidx], sigma2, sub, None)
        merged = montecarlo.state_merge_trials(st, s_fin, pidx)
        return eval_from_state(keys[0, 0], merged)

    def eval_dev(keys, state):
        return eval_from_state(keys[0, 0], unpack(state))

    T, M = TRIALS_AXIS, MODEL_AXIS
    SP = P(T, M)
    phase1 = jax.jit(jax.shard_map(
        p1_dev, mesh=mesh, in_specs=(P(T), P()),
        out_specs=(SP, SP), check_vma=False))
    phase23 = jax.jit(jax.shard_map(
        p23_dev, mesh=mesh,
        in_specs=(P(T), P(T), SP, SP, P()), out_specs=P(),
        check_vma=False), donate_argnums=(3,))
    eval_all = jax.jit(jax.shard_map(
        eval_dev, mesh=mesh, in_specs=(P(T), SP), out_specs=P(),
        check_vma=False), donate_argnums=(1,))
    return ShardedTwoPhaseFns(phase1, phase23, eval_all, model_size=tp)


def run_sharded_two_phase(fns: ShardedTwoPhaseFns, keys, snr, res: int,
                          min_bucket: int = 64, hint: dict | None = None):
    """Host orchestration of one sharded continuation-batched step.

    ``keys`` is ``(D, C, 2)``; only the per-trial ``active`` booleans cross
    to the host between phases.  With a ``hint`` dict (rolling static
    bucket, see the single-device runner) the whole step runs as ONE
    sharded program — phase 1, in-graph per-realization gather,
    continuation, evaluation, psum — and the only host traffic is the
    final sums fetch; overflow falls back to the mask-fetch path below.
    """
    phase1, phase23, eval_all, model_size = fns[:4]
    n_real = keys.shape[0] * keys.shape[1]
    if (hint is not None and hint.get("bucket")
            and fns.phase123_for is not None
            and os.environ.get("AMP_PHASE123", "1") not in ("0", "false")):
        out = metrics.fetch_sums(fns.phase123_for(hint["bucket"])(keys,
                                                                  snr))
        if out.pop("_overflow", 1.0) == 0.0:
            hint["bucket"] = montecarlo._hint_bucket(
                out.pop("_n_active") / n_real, min_bucket, res)
            return out
        out.pop("_n_active", None)
    y, state = phase1(keys, snr)
    active = np.asarray(state.active)               # (D*C, res)
    if model_size > 1:
        # (trials, model, res) stacking on a model>1 mesh; the verdicts
        # are replicated across model shards (psum-reduced convergence).
        active = active[:, 0, :]
    n_max = int(active.sum(axis=1).max())
    if hint is not None:
        # worst realization's survivor count sizes the next fused bucket
        hint["bucket"] = montecarlo._hint_bucket(float(n_max), min_bucket,
                                                 res)
    if n_max == 0:
        return eval_all(keys, state)
    bucket = max(min_bucket, 1 << (n_max - 1).bit_length())
    bucket = min(bucket, res)
    pad_rows = []
    for row in active:
        idx = np.flatnonzero(row)
        # pad with a CONVERGED trial where one exists: its pad rows are
        # frozen, so their tiles exit immediately and the in-graph
        # compaction rung sees the true survivor count (an active-dup
        # fill re-decodes the duplicate in every pad row — measured
        # 2.5% on the single-device bench)
        inactive = np.flatnonzero(~row)
        fill = (inactive[0] if len(inactive)
                else (idx[0] if len(idx) else 0))
        pad_rows.append(np.concatenate(
            [idx, np.full(bucket - len(idx), fill, np.int64)]))
    pad_idx = jnp.asarray(np.stack(pad_rows))
    return phase23(keys, pad_idx, y, state, snr)


class ShardedSimulator(montecarlo.Simulator):
    """Drop-in :class:`Simulator` that shards realizations over a mesh.

    Weak-scaling knob: per SNR point each of the ``trials``-axis devices
    runs ``chans_per_batch`` realizations of ``res`` trials per call.
    ``two_phase`` composes with BOTH axes: on the trials axis each device
    finishes its own convergence tail; on the model axis the compaction
    selects trial rows (identical on every frame shard) and phase 2
    resumes the halo/SV-domain decode from the column-sharded state.
    ``use_pallas`` composes with the trials axis only (the fused kernel
    decodes whole frames).
    """

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None, **kw):
        from .mesh import make_mesh
        self.mesh = mesh if mesh is not None else make_mesh()
        super().__init__(cfg, **kw)

    def _build_step(self, res: int):
        return make_sharded_step(self.cfg, self.algo, self.channel_kind,
                                 res, self.mesh,
                                 chans_per_device=self.chans_per_batch,
                                 precision=self._effective_precision(),
                                 estimate_phi=self.estimate_phi,
                                 operator_form=self.operator_form,
                                 use_pallas=self.use_pallas)

    def trials_per_point(self, epochs: int, res: int = 1) -> int:
        n_real = max(1, int(np.ceil(epochs / res)))
        DC = self.mesh.shape[TRIALS_AXIS] * self.chans_per_batch
        return int(np.ceil(n_real / DC)) * DC * res

    def run_point(self, ebn0_db: float, epochs: int, res: int = 1,
                  snr_idx: int = 0):
        cfg = self.cfg
        D = self.mesh.shape[TRIALS_AXIS]
        C = self.chans_per_batch
        snr_db = ebn0_db + 10 * np.log10(cfg.code_rate)
        snr = jnp.asarray(10 ** (snr_db / 10), jnp.float32)
        if self.two_phase is not None:
            fns = self._two_phase_fns(res)   # auto-k1 aware (base class)
            step = None
        else:
            step = self.step_fn(res)
        n_real = max(1, int(np.ceil(epochs / res)))
        n_calls = int(np.ceil(n_real / (D * C)))
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed), snr_idx)
        total = None
        for c in range(n_calls):
            idx = jnp.arange(c * D * C, (c + 1) * D * C).reshape(D, C)
            keys = jax.vmap(jax.vmap(
                lambda i: jax.random.fold_in(base, i)))(idx)
            if step is None:
                sums = run_sharded_two_phase(fns, keys, snr, res,
                                             hint=self._tp_hint)
            else:
                sums = step(keys, snr)
            total = metrics.accumulate(total, sums)
        out = metrics.finalize(total, cfg)
        self._last_meanT = out["T"]
        return out

    def _build_two_phase(self, res: int, k1: int):
        return make_sharded_two_phase_fns(
            self.cfg, self.algo, self.channel_kind, res, k1,
            self.mesh, chans_per_device=self.chans_per_batch,
            precision=self._effective_precision(),
            operator_form=self.operator_form,
            estimate_phi=self.estimate_phi,
            use_pallas=self.use_pallas)
