"""Monte-Carlo sweep engine.

Capability parity with the reference drivers (``bamp_model.py``,
``vamp_model.py``, ``scamp_model.py``, ``random_model.py``): an Eb/N0 grid
mapped to SNR via ``+10*log10(rate)`` (`bamp_model.py:49-50`), channel
regeneration every ``res`` trials (`bamp_model.py:55-56`), per-SNR metric
accumulation and JSON export, and the adaptive sweep termination at
``fer < 1e-3`` (`bamp_model.py:66-67`).  Like the reference's "final"
sweeps, the default channel construction is ``generate_as_sparc`` even in
``segmented`` mode (`bamp_model.py:56` — the published curves use the
SPARC-normalized matrices for all algorithms); pass ``channel_kind`` to
override.

TPU-first design: the jit boundary is "one channel realization, one batch
of trials" — the reference's serial ``res``-trial inner loop becomes one
batched decode where every trial is a column of an MXU matmul.  Several
channel realizations are additionally vmapped per call (``chans_per_batch``)
to fill the chip.  Host Python only handles the dynamic sweep control flow
(SNR grid, adaptive early exit), mirroring the reference's two-phase sweep
structure.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import channel as channel_ops
from ..ops import message as message_ops
from ..utils import artifacts, metrics
from . import bamp, scamp, vamp, vamp2

ALGO_DIRS = {"bamp": "BAMP", "vamp": "VAMP", "vamp2": "VAMP2",
             "scamp": "SCAMP", "random": "RANDOM"}


def _tree_sum(tree):
    return jax.tree_util.tree_map(lambda x: x.sum(axis=0), tree)


def sum_realizations(realization, keys, snr):
    """Sum metric pytrees of ``realization`` over a leading keys axis.

    vmap is the default; when the realization runs the fused Pallas kernel
    the loop is unrolled instead — ``pallas_call`` with input/output
    aliasing doesn't batch reliably under vmap, and the realization count
    per call is small.  Re-probed on hardware in round 4: a 2-wide vmap
    of the flagship whole-decode realization wedges the compiler for
    >10 minutes (never completed), so the unroll stands.
    """
    if getattr(realization, "use_pallas", False):
        sums = [realization(keys[i], snr) for i in range(keys.shape[0])]
        total = sums[0]
        for s in sums[1:]:
            total = jax.tree_util.tree_map(jnp.add, total, s)
        return total
    return _tree_sum(jax.vmap(lambda k: realization(k, snr))(keys))


def make_realization_fn(cfg: Config, algo: str, channel_kind: str, res: int,
                        precision=jax.lax.Precision.HIGHEST,
                        estimate_phi: bool = False,
                        operator_form: str = "dense",
                        use_pallas="auto"):
    """One Monte-Carlo channel realization with ``res`` batched trials.

    Returns ``fn(key, snr) -> metric sums`` — the jit/shard_map unit shared
    by the single-device :class:`Simulator` and the sharded sweeps in
    :mod:`..parallel.sweep`.  Mirrors the inner loop of
    ``Model.simulate`` (`bamp_model.py:54-59`).

    ``operator_form='banded'`` keeps the channel in tap form (identical
    sampled taps → the exact same realization the dense builder would
    materialize) and runs the decoders' mat-vecs as banded
    block-convolutions — required for the massive-MIMO config and ~25x
    faster than the dense form on TPU for the flagship config.  VAMP needs
    the dense matrix for its SVD.  ``'auto'`` (the default in
    :class:`Simulator`) picks banded whenever the algorithm and channel
    support it.

    ``use_pallas`` threads the fused whole-iteration kernel into the BAMP
    decode (never silently ignored: an explicit ``True`` raises where the
    kernel cannot apply).
    """
    from ..ops import operators

    if operator_form == "auto":
        operator_form = ("banded" if algo in ("bamp", "scamp")
                         and channel_kind != "iid" else "dense")
    if operator_form == "banded":
        if algo in ("vamp", "vamp2"):
            raise ValueError("VAMP requires the dense operator (SVD)")
        if channel_kind == "iid":
            raise ValueError("iid channels have no banded form")
    if use_pallas is True:
        if algo not in ("bamp", "scamp", "vamp", "vamp2"):
            raise ValueError("the fused Pallas decode covers bamp, "
                             "scamp, vamp and vamp2")
        if algo not in ("vamp", "vamp2") and operator_form != "banded":
            raise ValueError("use_pallas requires the banded operator "
                             "form (vamp/vamp2 use the SVD kernels "
                             "instead)")
    use_pallas = resolve_use_pallas(use_pallas, cfg, algo, operator_form,
                                    batch=res)

    def one_realization(key, snr):
        k_chan, k_msg, k_noise = jax.random.split(key, 3)
        sigma2 = cfg.E / snr
        msg = message_ops.generate_message(k_msg, cfg, res)
        if operator_form == "banded":
            if channel_kind == "sparc":
                W, A = operators.banded_sparc(k_chan, cfg,
                                              precision=precision)
            else:
                W, A = None, operators.banded_toeplitz(k_chan, cfg,
                                                       precision=precision)
            y = A.apply(msg.x) + channel_ops.awgn(k_noise, cfg, snr, res)
        else:
            if channel_kind == "sparc":
                W, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                W, A = None, channel_ops.generate_channel(k_chan, cfg)
            elif channel_kind == "iid":
                W, A = None, channel_ops.generate_as_random(k_chan, cfg)
            else:
                raise ValueError(f"unknown channel kind {channel_kind!r}")
            y = (jnp.matmul(msg.x, A.T, precision=precision)
                 + channel_ops.awgn(k_noise, cfg, snr, res))
        if algo == "bamp":
            out = bamp.decode(A, y, sigma2, cfg, precision=precision,
                              use_pallas=use_pallas)
        elif algo == "vamp":
            out = vamp.decode(vamp.svd(A), y, sigma2, cfg,
                              use_pallas=use_pallas, precision=precision)
        elif algo == "vamp2":
            # vamp2 whitens by dividing by s (`vamp2.py:22`), so it needs
            # the direct SVD: the Gram-eigh route zeroes singular values
            # below sqrt(eps)*s_max, which the division would blow up.
            out = vamp2.decode(vamp.svd(A, method="direct"), y, sigma2,
                               cfg, use_pallas=use_pallas,
                               precision=precision)
        else:
            out = scamp.decode(W, A, y, sigma2, cfg,
                               estimate_phi=estimate_phi,
                               use_pallas=use_pallas,
                               precision=precision)
        return metrics.evaluate_sums(out.xmap, out.xmmse, msg, out.T, cfg)

    # Resolved knobs for callers (vmap-vs-unroll choice, sharded plumbing).
    one_realization.use_pallas = use_pallas
    one_realization.operator_form = operator_form
    return one_realization


def make_batched_vamp_fn(cfg: Config, channel_kind: str, res: int, C: int,
                         precision=jax.lax.Precision.HIGHEST):
    """``fn(keys (C, 2), snr) -> metric sums`` decoding C VAMP channel
    realizations in ONE realization-batched kernel call.

    The vmap-of-kernel wedge (see :func:`sum_realizations`) forces the
    unrolled per-realization loop when the fused kernel is on — C kernel
    dispatches plus C SVDs serialized.  This path instead stacks the C
    realizations into one grid (``vamp.decode_batched``): the SVDs vmap
    (plain XLA), the decode is one ``pallas_call`` whose grid programs
    read their own realization's tap blocks, and the evaluation runs
    once on the flat (C*res) batch (valid because segmented/sparc
    decisions are per-trial; the random mode's global top-k is not
    batch-invariant and keeps the unrolled path).
    """
    if cfg.mode == "random":
        raise ValueError("batched VAMP needs batch-invariant decisions "
                         "(segmented/sparc modes)")

    def batched_realizations(keys, snr):
        sigma2 = cfg.E / snr

        def gen(key):
            k_chan, k_msg, k_noise = jax.random.split(key, 3)
            msg = message_ops.generate_message(k_msg, cfg, res)
            if channel_kind == "sparc":
                _, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                A = channel_ops.generate_channel(k_chan, cfg)
            else:
                A = channel_ops.generate_as_random(k_chan, cfg)
            y = (jnp.matmul(msg.x, A.T, precision=precision)
                 + channel_ops.awgn(k_noise, cfg, snr, res))
            return A, y, msg

        A_b, y_b, msg_b = jax.vmap(gen)(keys)          # (C, ...) stacks
        out = vamp.decode_batched(A_b, y_b, sigma2, cfg,
                                  precision=precision)
        CB = C * res
        flat = lambda a: a.reshape((CB,) + a.shape[2:])
        msg_flat = jax.tree.map(flat, msg_b)
        return metrics.evaluate_sums(flat(out.xmap), flat(out.xmmse),
                                     msg_flat, flat(out.T), cfg)

    batched_realizations.use_pallas = True
    batched_realizations.operator_form = "dense"
    return batched_realizations


def resolve_use_pallas(use_pallas, cfg: Config, algo: str,
                       operator_form: str, batch: int | None = None) -> bool:
    """'auto' enables the fused Pallas decode exactly where it is the
    measured win: BAMP/SCAMP on a banded operator on real TPU hardware
    with a complex segmented alphabet — the whole-decode kernel
    (in-kernel iteration loop + general-K segmented denoiser) measured
    1.08x the round-2 per-iteration kernel on the flagship OOK point,
    **2.54x** the XLA path on BAMPfinal QPSK (K=4), and **1.35x** on the
    flagship-dims SCAMP OOK sparc point; BAMP in the random generator
    mode via the in-kernel Bernoulli-mixture denoiser (**1.77x**); and
    VAMP via the SV-domain
    whole-decode kernel of :mod:`..ops.pallas.fused_vamp` (1.33x decode,
    1.05x per realization with the SVD and channel generation included).
    With ``batch`` given, the VMEM trial-tile fit is checked so 'auto'
    is exact (the massive Nt=1344 geometry cannot tile and stays on the
    XLA paths)."""
    kern = pallas_kernel_class(algo)
    if use_pallas == "auto":
        if jax.default_backend() != "tpu" or kern is None:
            return False
        if algo not in ("vamp", "vamp2") and operator_form != "banded":
            return False
        ok = kern.covers(cfg)
        if ok and batch is not None:
            ok = kern.fits(cfg, batch)
            if not ok and algo == "bamp":
                # Whole-frame tile doesn't fit (massive geometries) —
                # the FRAME-TILED per-iteration kernel may still cover
                # it (round 5; bamp.decode resolves the same chain).
                from ..ops.pallas.fused_bamp_tiled import (
                    TiledBandedIteration)
                ok = TiledBandedIteration.covers(cfg, batch)
        return ok
    if use_pallas is True and kern is None:
        # Honest knob: no fused kernel exists for this algorithm at all;
        # enforce the never-silent contract here rather than relying on
        # downstream guards in make_realization_fn.
        raise ValueError(
            f"use_pallas=True, but no fused decode kernel exists for "
            f"algo={algo!r}")
    if use_pallas is True and not kern.covers(cfg):
        # Honest knob: explicit True with a config the kernel cannot
        # decode (e.g. VAMP/SCAMP in the random generator mode) is an
        # error, not a silent XLA fallback.  Geometry no-fit (massive
        # configs) still falls back gracefully inside the decoders.
        raise ValueError(
            f"use_pallas=True, but the fused {algo} kernel does not cover "
            f"mode={cfg.mode!r} alphabet={cfg.alphabet!r} "
            f"(is_complex={cfg.is_complex}); it needs a complex "
            "segmented/sparc alphabet"
            + (" or the random mode" if algo == "bamp" else ""))
    return bool(use_pallas)


def pallas_kernel_class(algo: str):
    """The whole-decode kernel class for ``algo`` (None when no kernel
    exists, e.g. an unknown algo).  Coverage/fit questions delegate to its
    ``covers``/``fits`` classmethods so 'auto' resolution can never drift
    from the constructors' own VMEM math."""
    if algo == "bamp":
        from ..ops.pallas.fused_bamp import FusedBandedDecode
        return FusedBandedDecode
    if algo == "scamp":
        from ..ops.pallas.fused_scamp import FusedScampDecode
        return FusedScampDecode
    if algo == "vamp":
        from ..ops.pallas.fused_vamp import FusedVampDecode
        return FusedVampDecode
    if algo == "vamp2":
        from ..ops.pallas.fused_vamp2 import FusedVamp2Decode
        return FusedVamp2Decode
    return None


# Decoder-state fields that are NOT trial-indexed.  Every decoder state
# (BAMPState, VAMPState, VAMP2State, SCAMPState, HaloState, HaloScampState,
# VampTPState, TPState) carries per-trial arrays with a leading trials dim
# in every field except these named loop scalars — selection is structural
# (keyed on the field NAME), never on array shapes, so a future field whose
# leading dim coincidentally equals the trial count cannot be misrouted.
_STATE_SCALAR_FIELDS = frozenset({"t", "alive"})


def state_take_trials(state, idx):
    """Gather trial rows ``idx`` of a decoder-state NamedTuple."""
    return type(state)(**{
        f: (v if f in _STATE_SCALAR_FIELDS else v[idx])
        for f, v in zip(state._fields, state)})


def state_merge_trials(state, sub, idx):
    """Scatter a sub-batch state back into the full state at rows ``idx``
    (the loop scalars keep the full state's values)."""
    return type(state)(**{
        f: (v if f in _STATE_SCALAR_FIELDS else v.at[idx].set(s))
        for f, v, s in zip(state._fields, state, sub)})


class TwoPhaseCore(NamedTuple):
    """Raw (unjitted) continuation-batching functions — the shared unit the
    single-device wrapper (:func:`make_two_phase_fns`) jits directly and
    the sharded wrapper (:func:`..parallel.sweep.make_sharded_two_phase_fns`)
    wraps in ``shard_map``."""

    phase1: Callable      # (key, snr) -> (y, state)
    phase2: Callable      # (key, y_sub, state_sub, snr[, iter_cap]) -> state'
    scatter_eval: Callable  # (key, state, sub_state, pad_idx) -> sums
    evaluate: Callable    # (key, state) -> sums
    use_pallas: bool
    res: int
    cap: Optional[int] = None    # total iteration budget (cfg.N_Layers)
    k1: Optional[int] = None     # phase-1 budget
    phase23: Optional[Callable] = None   # fused gather+decode+merge+eval
    phase1e: Optional[Callable] = None   # phase1 + frozen-trial eval
    phase23b: Optional[Callable] = None  # bucket-only continuation + eval
    phase123: Optional[Callable] = None  # whole realization, static bucket


def make_two_phase_core(cfg: Config, algo: str, channel_kind: str, res: int,
                        k1: int, precision=jax.lax.Precision.HIGHEST,
                        operator_form: str = "auto",
                        estimate_phi: bool = False,
                        use_pallas="auto") -> "TwoPhaseCore":
    """Continuation-batched realization (phase1 / phase2 / evaluate).

    A batched decode runs until its SLOWEST trial converges — at the
    flagship 8 dB point the batch mean is ~11 iterations but ~2% of trials
    run to the 100-iteration cap, so a single ``while_loop`` wastes ~9x
    the useful work.  Continuation batching caps phase 1 at ``k1``
    iterations, gathers the unconverged tail into a small padded bucket,
    and finishes it separately — the decode trajectory is bit-identical
    (resumable ``lax.while_loop`` state), only the batch shape changes.
    Works for every decoder (their states are all resumable pytrees).

    The transmitted message is NOT carried between phases: it is
    deterministic given the key, so ``scatter_eval``/``evaluate``
    regenerate it on device instead of holding the (res, N) complex
    ground truth alive across the whole decode — at res=131072 that
    buffer alone is 2.7 GB of HBM (the round-3 memory wall).
    """
    from ..ops import operators

    if operator_form == "auto":
        operator_form = ("banded" if algo in ("bamp", "scamp")
                         and channel_kind != "iid" else "dense")
    if operator_form == "banded":
        if algo in ("vamp", "vamp2"):
            raise ValueError("VAMP requires the dense operator (SVD)")
        if channel_kind == "iid":
            raise ValueError("iid channels have no banded form")
    if algo == "scamp" and channel_kind != "sparc":
        raise ValueError("scamp requires the sparc channel")
    if use_pallas is True and algo not in ("bamp", "scamp", "vamp",
                                           "vamp2"):
        raise ValueError(
            "the fused Pallas decode covers bamp, scamp, vamp and vamp2")
    use_pallas = resolve_use_pallas(use_pallas, cfg, algo, operator_form,
                                    batch=res)

    def make_ctx(k_chan):
        """Rebuild the (deterministic given key) per-realization operator
        data: (W, A) or the channel SVD."""
        if operator_form == "banded":
            if channel_kind == "sparc":
                W, A = operators.banded_sparc(k_chan, cfg,
                                              precision=precision)
            else:
                W, A = None, operators.banded_toeplitz(k_chan, cfg,
                                                       precision=precision)
        else:
            if channel_kind == "sparc":
                W, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                W, A = None, channel_ops.generate_channel(k_chan, cfg)
            else:
                W, A = None, channel_ops.generate_as_random(k_chan, cfg)
        if algo in ("vamp", "vamp2"):
            # vamp2 divides by s (whitening) — needs the direct SVD's
            # accurate small singular values; vamp uses s² only.
            return W, vamp.svd(A, method="direct" if algo == "vamp2"
                               else "auto")
        return W, A

    def run_decode(ctx, y, sigma2, state0=None, iter_cap=None):
        W, A = ctx
        kw = dict(precision=precision, state0=state0, iter_cap=iter_cap,
                  return_state=True)
        if algo == "bamp":
            return bamp.decode(A, y, sigma2, cfg, use_pallas=use_pallas,
                               **kw)
        if algo == "scamp":
            return scamp.decode(W, A, y, sigma2, cfg,
                                estimate_phi=estimate_phi,
                                use_pallas=use_pallas, **kw)
        if algo == "vamp":
            return vamp.decode(A, y, sigma2, cfg, use_pallas=use_pallas,
                               **kw)
        return vamp2.decode(A, y, sigma2, cfg, use_pallas=use_pallas,
                            **kw)

    def views(state):
        """(decision statistic, posterior mean) of a decoder state — VAMP
        variants hand the pseudo-data ``r`` to the decision layer
        (`vamp.py:187`)."""
        stat = state.xmap if hasattr(state, "xmap") else state.r
        return stat, state.xmmse

    def regen_msg(key):
        """The message is deterministic given the realization key — rebuilt
        at evaluation time instead of living across the decode."""
        _, k_msg, _ = jax.random.split(key, 3)
        return message_ops.generate_message(k_msg, cfg, res)

    def phase1(key, snr):
        k_chan, k_msg, k_noise = jax.random.split(key, 3)
        msg = message_ops.generate_message(k_msg, cfg, res)
        sigma2 = cfg.E / snr
        noise = channel_ops.awgn(k_noise, cfg, snr, res)
        if operator_form == "banded":
            ctx = make_ctx(k_chan)
            y = ctx[1].apply(msg.x) + noise
        else:
            if channel_kind == "sparc":
                W, A = channel_ops.generate_as_sparc(k_chan, cfg)
            elif channel_kind == "toeplitz":
                W, A = None, channel_ops.generate_channel(k_chan, cfg)
            else:
                W, A = None, channel_ops.generate_as_random(k_chan, cfg)
            y = jnp.matmul(msg.x, A.T, precision=precision) + noise
            ctx = ((W, vamp.svd(A, method="direct" if algo == "vamp2"
                                else "auto"))
                   if algo in ("vamp", "vamp2") else (W, A))
        _, state = run_decode(ctx, y, sigma2, iter_cap=k1)
        return y, state

    def phase2(key, y_sub, state_sub, snr, iter_cap=None):
        """Continue a gathered sub-batch; ``iter_cap`` (static, GLOBAL
        iteration count) lets the host ladder insert intermediate
        compaction rungs — ``None`` runs to the full cap.

        The to-cap form re-compacts IN-GRAPH: the trials that hit the
        iteration cap (decode failures) are spread over every trial
        tile, so without compaction every tile of the bucket runs the
        full budget.  A mid-phase rung at 2*k1 counts the survivors and,
        when they fit half the bucket, ``lax.cond`` branches into a
        gather -> half-size decode -> scatter — all on device (a
        host-orchestrated rung pays a ~25 ms active-mask fetch per rung,
        measured to cost more than it saves).  Trial trajectories are
        unaffected (per-trial freeze; batch shape only changes which
        tile a trial shares).  Static guard: buckets below 512 trials
        skip the rung (the compile cost of three decode instances isn't
        worth tens of microseconds of tile tail)."""
        k_chan, _, _ = jax.random.split(key, 3)
        sigma2 = cfg.E / snr
        ctx = make_ctx(k_chan)
        B = y_sub.shape[0]
        mid = 2 * k1
        no_rung = os.environ.get("AMP_INGRAPH_COMPACT", "1") in ("0",
                                                                 "false")
        if iter_cap is not None or B < 512 or mid >= cfg.N_Layers \
                or no_rung:
            _, s = run_decode(ctx, y_sub, sigma2, state0=state_sub,
                              iter_cap=iter_cap)
            return s
        _, s = run_decode(ctx, y_sub, sigma2, state0=state_sub,
                          iter_cap=mid)

        def compact(s):
            # stable sort: actives first, original order preserved
            idx = jnp.argsort(jnp.logical_not(s.active))[:B // 2]
            _, s2 = run_decode(ctx, y_sub[idx], sigma2,
                               state0=state_take_trials(s, idx))
            return state_merge_trials(s, s2, idx)

        def direct(s):
            _, s2 = run_decode(ctx, y_sub, sigma2, state0=s)
            return s2

        return jax.lax.cond(jnp.sum(s.active) <= B // 2, compact, direct, s)

    def scatter_eval(key, state, sub_state, pad_idx):
        merged = state_merge_trials(state, sub_state, pad_idx)
        stat, xmmse = views(merged)
        return metrics.evaluate_sums(stat, xmmse, regen_msg(key), merged.T,
                                     cfg)

    def phase23(key, y, state, pad_idx, snr):
        """Gather + continuation decode + scatter merge + evaluation as
        ONE device program — the decomposed phase2/scatter_eval pair
        plus the bucket gather cost three dispatch round-trips on the
        remote tunnel; fused they cost one (bit-identical sums: the op
        sequence is unchanged, only the jit boundary moved)."""
        sub = state_take_trials(state, pad_idx)
        s2 = phase2(key, y[pad_idx], sub, snr)
        return scatter_eval(key, state, s2, pad_idx)

    def phase1e(key, snr):
        """Phase 1 with the FROZEN trials' metric pass folded in
        (round-5): evaluates the converged rows (weight = 1 - active)
        right inside the phase-1 program, so the continuation step only
        ever evaluates the BUCKET — the full-batch evaluation pass
        (res-sized decisions + scatter merge) leaves the critical path
        entirely.  No trial is counted twice: active trials carry weight
        0 here and weight 1 (first occurrence) in phase23b."""
        y, state = phase1(key, snr)
        stat, xmmse = views(state)
        frozen = metrics.evaluate_sums(
            stat, xmmse, regen_msg(key), state.T, cfg,
            weight=1.0 - state.active.astype(jnp.float32))
        return y, state, frozen

    def phase23b(key, y, state, pad_idx, valid, snr, frozen):
        """Bucket-only continuation + evaluation: gather the active
        trials, finish them, evaluate JUST the bucket rows (``valid``
        masks the padding duplicates) and add the phase-1 frozen sums —
        one device program, no res-sized merge or evaluation.  Sums
        differ from the full-batch path only by f32 re-association."""
        sub = state_take_trials(state, pad_idx)
        s2 = phase2(key, y[pad_idx], sub, snr)
        stat, xmmse = views(s2)
        msg = regen_msg(key)
        msg_sub = jax.tree.map(lambda a: a[pad_idx], msg)
        sums = metrics.evaluate_sums(stat, xmmse, msg_sub, s2.T, cfg,
                                     weight=valid)
        return {k: sums[k] + frozen[k] for k in sums}

    def evaluate(key, state):
        stat, xmmse = views(state)
        return metrics.evaluate_sums(stat, xmmse, regen_msg(key), state.T,
                                     cfg)

    def phase123(key, snr, *, bucket):
        """The WHOLE realization as ONE device program: phase 1, the
        bucket gather built IN-GRAPH (stable argsort, actives first —
        so no active-mask round-trip), continuation decode, scatter
        merge and evaluation.  ``bucket`` is static (the host supplies
        a hint from the previous realization's survivor count); the
        returned sums carry ``_n_active`` (next hint) and ``_overflow``
        (survivors exceeded the bucket → the caller discards these sums
        and redoes the realization on the host-orchestrated path).

        Metric sums are identical to the host path: the gather keeps
        active trials in original order (argsort is stable, matching
        ``_pad_bucket``); the pad rows are DISTINCT frozen trials
        instead of duplicates of one, but frozen rows pass through
        phase 2 untouched and scatter back their own unchanged state,
        so no row of the merged batch differs."""
        y, state = phase1(key, snr)
        n_act = jnp.sum(state.active.astype(jnp.int32))
        idx = jnp.argsort(jnp.logical_not(state.active))[:bucket]
        sub = state_take_trials(state, idx)
        s2 = phase2(key, y[idx], sub, snr)
        sums = dict(scatter_eval(key, state, s2, idx))
        sums["_n_active"] = n_act.astype(jnp.float32)
        sums["_overflow"] = (n_act > bucket).astype(jnp.float32)
        return sums

    # The bucket-evaluation pair is withheld for the random generator
    # mode: its decision layer is a GLOBAL top-k over the whole batch
    # (`loss.py:198-221`, metrics.random_decision), so evaluating a
    # gathered bucket would change the decisions themselves — only
    # per-trial decision rules (segmented/sparc) are batch-shape
    # invariant.
    batch_invariant = cfg.mode != "random"
    return TwoPhaseCore(phase1=phase1, phase2=phase2,
                        scatter_eval=scatter_eval, evaluate=evaluate,
                        use_pallas=use_pallas, res=res,
                        cap=cfg.N_Layers, k1=k1, phase23=phase23,
                        phase1e=phase1e if batch_invariant else None,
                        phase23b=phase23b if batch_invariant else None,
                        phase123=phase123)


def make_two_phase_fns(cfg: Config, algo: str, channel_kind: str, res: int,
                       k1: int, precision=jax.lax.Precision.HIGHEST,
                       operator_form: str = "auto",
                       estimate_phi: bool = False,
                       use_pallas="auto"):
    """Jitted single-device continuation batching.

    Returns a :class:`TwoPhaseFns`, unpackable as the classic 4-tuple
    ``(phase1, phase2_for, scatter_eval, evaluate)`` plus ladder
    metadata:
      phase1(key, snr) -> (y, state)
      phase2_for(bucket)(key, y_sub, state_sub, snr[, iter_cap]) -> state'
      scatter_eval(key, state, sub_state, pad_idx) -> metric sums
      evaluate(key, state) -> metric sums

    The decoder state is DONATED to scatter_eval/phase2 (the scatter
    merge runs in place; nothing reuses the phase-1 buffers afterwards).
    """
    core = make_two_phase_core(cfg, algo, channel_kind, res, k1,
                               precision=precision,
                               operator_form=operator_form,
                               estimate_phi=estimate_phi,
                               use_pallas=use_pallas)
    phase2 = jax.jit(core.phase2, donate_argnums=(2,),
                     static_argnums=(4,))  # retraces per (bucket, cap)
    p123_cache: dict = {}

    def phase123_for(bucket: int):
        if bucket not in p123_cache:
            p123_cache[bucket] = jax.jit(
                partial(core.phase123, bucket=bucket))
        return p123_cache[bucket]

    return TwoPhaseFns(
        jax.jit(core.phase1), lambda bucket: phase2,
        jax.jit(core.scatter_eval, donate_argnums=(1, 2)),
        jax.jit(core.evaluate, donate_argnums=(1,)),
        cap=core.cap, k1=core.k1,
        phase23=jax.jit(core.phase23, donate_argnums=(1, 2)),
        phase1e=(jax.jit(core.phase1e)
                 if core.phase1e is not None else None),
        phase23b=(jax.jit(core.phase23b, donate_argnums=(1, 2))
                  if core.phase23b is not None else None),
        phase123_for=phase123_for)


class TwoPhaseFns(NamedTuple):
    """Jitted continuation-batching bundle (see make_two_phase_fns)."""

    phase1: Callable
    phase2_for: Callable
    scatter_eval: Callable
    evaluate: Callable
    cap: Optional[int] = None
    k1: Optional[int] = None
    phase23: Optional[Callable] = None
    phase1e: Optional[Callable] = None
    phase23b: Optional[Callable] = None
    phase123_for: Optional[Callable] = None


def _pad_bucket(active: np.ndarray, min_bucket: int):
    """(pad_idx, bucket) for the active trials — padded to the next power
    of two so jit shapes are reused across realizations.

    Padding rows duplicate a CONVERGED trial when one exists: converged
    rows are frozen, so their tiles exit immediately and the in-graph
    compaction rung sees the true survivor count.  (Padding with an
    active trial — the previous scheme — re-decoded the duplicate in
    every pad row and, when that trial ran to cap, inflated the active
    count by the whole pad width.)  Duplicate indices are harmless on
    the scatter side: every copy writes back the same frozen state."""
    idx = np.flatnonzero(active)
    inactive = np.flatnonzero(~active)
    fill = inactive[0] if len(inactive) else idx[0]
    bucket = max(min_bucket, 1 << (len(idx) - 1).bit_length())
    bucket = min(bucket, active.size)
    pad = np.concatenate([idx, np.full(bucket - len(idx), fill,
                                       idx.dtype)])
    return jnp.asarray(pad), bucket


@jax.jit
def _take_trials_jit(state, y, idx):
    """One-dispatch gather of the phase-2 bucket (state rows + y rows).

    The eager per-field gathers this replaces were ~10 sequential
    dispatches — ~90 ms of pure round-trip latency per realization on
    the remote-TPU tunnel (measured round 4), rivaling phase 2 itself.
    """
    return state_take_trials(state, idx), y[idx]


def _hint_bucket(n_active: float, min_bucket: int, res: int) -> int:
    """Next realization's static bucket from this one's survivor count:
    pow2 with 1.5x headroom (survivor counts are binomial across
    realizations — at res=65536 the relative spread is <3%, so 1.5x
    makes overflow fallbacks rare), floored at ``min_bucket`` and capped
    at ``res``."""
    want = max(min_bucket, int(np.ceil(n_active * 1.5)), 1)
    return min(1 << (want - 1).bit_length(), res)


def run_two_phase_realization(fns, key, snr, min_bucket: int = 64,
                              ladder: bool = False, hint: dict | None = None):
    """Host orchestration of one continuation-batched realization.

    With ``ladder=True`` (and cap/k1 metadata on ``fns``), the
    continuation phase re-compacts geometrically: rungs at global
    iteration counts 2*k1, 4*k1, ... re-gather the still-active trials
    into half-size buckets before the final to-cap run.  The decode
    trajectory is bit-identical either way (resumable state; rungs only
    change batch shapes).  Measured at the flagship 8 dB point
    (res=65536, k1=12) the rung's device->host active-mask fetch plus
    the extra dispatch cost MORE than the compaction saves (93.4k
    trials/s unladdered vs 91.6k with one rung — per-tile early exit
    already absorbs most of the tail imbalance phase 2 would re-pay),
    so the ladder is OFF by default; it remains available for workloads
    with much larger caps where a rung amortizes better.  An always-win
    version needs in-graph compaction (lax.cond on the active count
    with static half-bucket shapes) — no host sync.
    """
    if isinstance(fns, tuple) and not hasattr(fns, "cap"):
        # Repacks a positional tuple of CURRENT-signature fields only:
        # the phase2 callables must accept the trailing ``t`` argument
        # (phase2(key, y, state, snr, t)); pre-``t`` 4-arg callables are
        # not supported through this shim.
        fns = TwoPhaseFns(*fns)
    if (hint is not None and not ladder and fns.phase123_for is not None
            and hint.get("bucket")
            and os.environ.get("AMP_PHASE123", "1") not in ("0", "false")):
        # Single-program realization: the previous realization's
        # survivor count sizes a static bucket, so the gather happens
        # IN-GRAPH and the only host round-trip is the final sums
        # fetch.  On overflow (survivors > bucket — rare with the 1.5x
        # headroom) the sums are discarded and the realization redone
        # on the host-orchestrated path below.
        out = metrics.fetch_sums(
            fns.phase123_for(hint["bucket"])(key, snr))
        if out.pop("_overflow", 1.0) == 0.0:
            hint["bucket"] = _hint_bucket(out.pop("_n_active"),
                                          min_bucket,
                                          int(out["trials"]))
            return out
    if (not ladder and fns.phase1e is not None
            and fns.phase23b is not None
            and os.environ.get("AMP_BUCKET_EVAL", "0") not in ("0",
                                                               "false")):
        # Opt-in (measured round 5: 111.0k vs 116.3k trials/s at the
        # flagship point — a 5% LOSS): phase 1 evaluates its own frozen
        # trials (weight = 1 - active) and the continuation evaluates
        # ONLY the bucket (padding duplicates masked).  The hoped-for
        # win was dropping the res-sized scatter merge + evaluation
        # from phase23 — but the frozen-weighted evaluation is still
        # res-sized (decisions run over every trial), so the merge was
        # the only true saving and the extra bucket-sized eval +
        # weight multiplies cost more.  Kept for workloads where the
        # merge dominates (very large states / small buckets).
        y, state, frozen = fns.phase1e(key, snr)
        active = np.asarray(state.active)
        if int(active.sum()) == 0:
            return frozen
        pad_idx, bucket = _pad_bucket(active, min_bucket)
        pad_np = np.asarray(pad_idx)
        first = np.zeros(pad_np.size, bool)
        first[np.unique(pad_np, return_index=True)[1]] = True
        valid = jnp.asarray((first & active[pad_np]).astype(np.float32))
        return fns.phase23b(key, y, state, pad_idx, valid, snr, frozen)
    y, state = fns.phase1(key, snr)
    active = np.asarray(state.active)
    if hint is not None:
        hint["bucket"] = _hint_bucket(float(active.sum()), min_bucket,
                                      active.size)
    if int(active.sum()) == 0:
        return fns.evaluate(key, state)
    pad_idx, bucket = _pad_bucket(active, min_bucket)
    if not ladder and fns.phase23 is not None:
        # fused single-program continuation: gather + decode (with the
        # in-graph compaction rung) + scatter merge + evaluation
        return fns.phase23(key, y, state, pad_idx, snr)
    sub, y_sub = _take_trials_jit(state, y, pad_idx)
    cap, t = fns.cap, fns.k1
    stack = []                       # (parent_sub, pad_into_parent)
    # Each rung costs a device->host fetch of the active mask (~tens of
    # ms on the remote tunnel) plus an extra dispatch, so rungs only pay
    # while the bucket is a sizable slice of the batch — below res/16
    # the to-cap run is cheaper than another sync (measured: laddering
    # all the way down cost 12% at the flagship point; one rung at
    # bucket=res/16 gains ~10%).
    if ladder and cap is not None and t is not None:
        while 2 * t < cap and bucket > max(min_bucket, active.size // 16):
            t *= 2
            sub = fns.phase2_for(bucket)(key, y_sub, sub, snr, t)
            act = np.asarray(sub.active)
            if int(act.sum()) == 0:
                break
            pad2, nb = _pad_bucket(act, min_bucket)
            if nb >= act.size:       # no compaction at this rung
                continue
            stack.append((sub, pad2))
            sub, y_sub = _take_trials_jit(sub, y_sub, pad2)
            bucket = nb
    if bool(np.asarray(sub.active).any()):
        sub = fns.phase2_for(bucket)(key, y_sub, sub, snr, None)
    while stack:
        parent, pad2 = stack.pop()
        sub = state_merge_trials(parent, sub, pad2)
    return fns.scatter_eval(key, state, sub, pad_idx)


def run_two_phase_batches(fns, keys, snr, hint: dict,
                          min_bucket: int = 64):
    """Run several realizations with DEFERRED sums fetching: on the
    single-program (phase123) path the per-batch device sums accumulate
    ON DEVICE and the host fetches ONCE at the end — zero per-batch
    round-trips.  The summed ``_overflow`` flag detects any batch whose
    survivors exceeded the static bucket; that (rare) case redoes the
    whole key list on the per-realization path.  Returns fetched float
    sums."""
    if (hint.get("bucket") and fns.phase123_for is not None
            and os.environ.get("AMP_PHASE123", "1") not in ("0", "false")):
        fn = fns.phase123_for(hint["bucket"])
        total = None
        for k in keys:
            total = metrics.accumulate(total, fn(k, snr))
        out = metrics.fetch_sums(total)
        if out.pop("_overflow", 1.0) == 0.0:
            res = int(out["trials"]) // len(keys)
            hint["bucket"] = _hint_bucket(
                out.pop("_n_active") / len(keys), min_bucket, res)
            return out
    total = None
    for k in keys:
        total = metrics.accumulate(
            total, run_two_phase_realization(fns, k, snr, min_bucket,
                                             hint=hint))
    out = metrics.fetch_sums(total)
    out.pop("_overflow", None)
    out.pop("_n_active", None)
    return out


# Quantized k1 grid for two_phase='auto': the compiled TwoPhaseFns are
# cached per (res, k1), so auto-k1 costs at most a handful of compiles per
# sweep even when mean T spans 57 -> 6 (BAMPfinal OOK 6 -> 10 dB).
_AUTO_K1_GRID = (4, 6, 8, 10, 12, 14, 16, 20, 24, 32, 48, 64, 96, 128)


def auto_k1(mean_t: Optional[float], cap: int) -> int:
    """Phase-1 budget for a point whose expected mean T is ``mean_t``.

    Measured at the flagship 8 dB point (meanT 10.92; BASELINE.md round-4
    ladder): k1 in {10, 12, 14, 16, 20} gave {92.4, 97.6, 97.2, 93.4,
    92.5}k trials/s — the optimum sits just ABOVE the mean (k1 = 12 ~
    meanT + 1): below it phase 2 re-decodes a large bucket, far above it
    phase 1 drags every tile through the convergence tail.  ``mean_t``
    is typically the previous sweep point's measurement (T falls
    monotonically with SNR on converging configs, so it upper-bounds the
    current point's); ``None`` (no history) falls back to 16, the
    pre-round-4 default.  The result is clamped to ``cap`` (k1 == cap
    degenerates to single-phase, correct for cap-running workloads)."""
    if mean_t is None:
        target = 16
    else:
        target = int(np.ceil(mean_t)) + 1
    for k in _AUTO_K1_GRID:
        if k >= target:
            return min(k, cap)
    return min(_AUTO_K1_GRID[-1], cap)


class Simulator:
    """Sweep driver for one (config, algorithm) pair.

    Args:
        cfg: system config.
        algo: 'bamp' | 'vamp' | 'vamp2' | 'scamp'.
        channel_kind: 'sparc' (default, matching the reference's final
            sweeps), 'toeplitz' (`channel.py:40-73`), or 'iid'
            (`channel.py:97-101`, the RANDOM driver).
        out_root: artifact root directory ('Simulations').
        algo_dir: artifact subdirectory (e.g. 'BAMPfinal'); defaults by algo.
        seed: base PRNG seed; every (SNR point, realization) derives its own
            counter-based key, so sweeps are reproducible and shardable.
        chans_per_batch: channel realizations vmapped per device call.
        donate: donate per-call buffers to XLA.
    """

    def __init__(self, cfg: Config, algo: str = "bamp",
                 channel_kind: str = "sparc", out_root: str = "Simulations",
                 algo_dir: Optional[str] = None, seed: int = 0,
                 chans_per_batch: int = 1, estimate_phi: bool = False,
                 operator_form: str = "auto", two_phase: Optional[int] = None,
                 use_pallas="auto",
                 precision=jax.lax.Precision.HIGHEST,
                 progress: Callable[[str], None] = print):
        if algo not in ("bamp", "vamp", "vamp2", "scamp"):
            raise ValueError(f"unknown algo {algo!r}")
        if algo == "scamp" and channel_kind != "sparc":
            raise ValueError("scamp requires the sparc channel")
        if isinstance(two_phase, str) and two_phase != "auto":
            raise ValueError("two_phase must be an int, 'auto', or None")
        if isinstance(precision, str) and precision == "auto":
            # Codified round-4 measurement (BASELINE.md VAMP section):
            # the 3-pass bf16 ladder (HIGH) is 1.5x+ on cap-running
            # workloads, and its only hazard — the ~2^-16 relative error
            # fluttering the 1e-5 allclose early stop so trials never
            # freeze — is VOID when every trial runs to the cap anyway.
            # 'auto' selects HIGH for a point when the PREVIOUS point's
            # measured mean T pinned at the cap (cap-running regime,
            # e.g. VAMPfinal QPSK: FER=1, T=cap across the sweep), and
            # reference-faithful HIGHEST otherwise (BAMP T statistics
            # untouched).  Boundary: a sweep leaves the HIGH regime only
            # when a point's mean T drops below cap despite the flutter.
            self._precision_auto = True
            precision = jax.lax.Precision.HIGHEST
        else:
            self._precision_auto = False
        self.cfg = cfg
        self.algo = algo
        self.channel_kind = channel_kind
        self.seed = seed
        self.chans_per_batch = chans_per_batch
        self.estimate_phi = estimate_phi
        self.operator_form = operator_form
        self.two_phase = two_phase
        self.use_pallas = use_pallas
        self.precision = precision
        self.progress = progress
        self.path = os.path.join(out_root, algo_dir or ALGO_DIRS[algo],
                                 cfg.name)
        self._step = None  # compiled lazily per (res, precision)
        self._tp_fns = None       # static-k1 cache: (res, fns)
        self._tp_cache = {}       # auto cache: {(res, k1, precision): fns}
        self._last_meanT = None   # previous point's mean T (auto inputs)
        self._tp_hint = {}        # rolling phase123 bucket hint
        self._probe = None        # compiled auto-k1 probe step

    # --- one jitted step: C channel realizations x res trials -------------

    def _effective_precision(self):
        """The matmul precision for the NEXT point (see the 'auto'
        policy note in ``__init__``)."""
        if not self._precision_auto:
            return self.precision
        cap = self.cfg.N_Layers
        if self._last_meanT is not None and self._last_meanT >= cap:
            return jax.lax.Precision.HIGH
        return jax.lax.Precision.HIGHEST

    def _build_step(self, res: int):
        one_realization = make_realization_fn(
            self.cfg, self.algo, self.channel_kind, res,
            precision=self._effective_precision(),
            estimate_phi=self.estimate_phi,
            operator_form=self.operator_form, use_pallas=self.use_pallas)
        from ..ops.pallas.fused_vamp import FusedVampDecode
        if (self.algo == "vamp" and self.chans_per_batch > 1
                and one_realization.use_pallas
                and self.cfg.mode != "random"
                and FusedVampDecode.fits(self.cfg, res, batched=True)):
            # Realization-batched kernel: one grid decodes all C
            # realizations (the vmap-of-kernel wedge workaround).
            return jax.jit(make_batched_vamp_fn(
                self.cfg, self.channel_kind, res, self.chans_per_batch,
                precision=self._effective_precision()))

        @partial(jax.jit, static_argnames=())
        def step(keys, snr):
            return sum_realizations(one_realization, keys, snr)

        return step

    def step_fn(self, res: int):
        key = (res, self._effective_precision())
        if self._step is None or self._step[0] != key:
            self._step = (key, self._build_step(res))
        return self._step[1]

    def _probe_meanT(self, snr_dev, key_base):
        """Short probe decode at THIS point: mean T from a small batch
        so auto-k1 sits just above it.  The previous point's mean T
        (the fallback when probing is off) OVERSHOOTS ~2x at 1 dB grid
        spacing (BAMPfinal OOK: T falls 57 -> 29 -> 11 across adjacent
        points); the probe costs one small-batch decode per point (the
        compiled step is cached across the sweep)."""
        res_p = 2048
        if self._probe is None:
            self._probe = jax.jit(make_realization_fn(
                self.cfg, self.algo, self.channel_kind, res_p,
                precision=self._effective_precision(),
                estimate_phi=self.estimate_phi,
                operator_form=self.operator_form,
                use_pallas=self.use_pallas))
        out = metrics.fetch_sums(self._probe(
            jax.random.fold_in(key_base, 0x9A0BE), snr_dev))
        return out["T"] / out["trials"]

    def _two_phase_fns(self, res: int, snr_dev=None, key_base=None):
        """The continuation-batching bundle for this point.

        ``two_phase='auto'`` picks k1 just above the point's mean T —
        measured by a short probe batch when possible, else the
        previous point's mean (:func:`auto_k1`) — and caches the
        compiled bundle per (res, k1) on the quantized grid.  Metric
        sums are k1-INVARIANT (the decode trajectory is resumable
        state, the phase boundary only changes batch shapes), so
        auto-k1 is a pure scheduling choice."""
        if self.two_phase == "auto":
            mean_t = self._last_meanT
            if snr_dev is not None and key_base is not None \
                    and os.environ.get("AMP_AUTO_PROBE", "1") not in (
                        "0", "false"):
                mean_t = self._probe_meanT(snr_dev, key_base)
            k1 = auto_k1(mean_t, self.cfg.N_Layers)
        else:
            k1 = self.two_phase
        key = (res, k1, self._effective_precision())
        if key not in self._tp_cache:
            self._tp_cache[key] = self._build_two_phase(res, k1)
        return self._tp_cache[key]

    def _build_two_phase(self, res: int, k1: int):
        """Hook for subclasses (the sharded simulator builds mesh fns)."""
        return make_two_phase_fns(
            self.cfg, self.algo, self.channel_kind, res, k1,
            precision=self._effective_precision(),
            operator_form=self.operator_form,
            estimate_phi=self.estimate_phi,
            use_pallas=self.use_pallas)

    # --- host-side sweep --------------------------------------------------

    def trials_per_point(self, epochs: int, res: int = 1) -> int:
        """Trials :meth:`run_point` actually decodes — batching rounds the
        realization count up to a multiple of ``chans_per_batch``, and the
        manifest must record the true sample count, not the request."""
        n_real = max(1, int(np.ceil(epochs / res)))
        if self.two_phase is not None:
            return n_real * res
        C = self.chans_per_batch
        return int(np.ceil(n_real / C)) * C * res

    def run_point(self, ebn0_db: float, epochs: int, res: int = 1,
                  snr_idx: int = 0) -> Dict[str, float]:
        """Simulate one Eb/N0 point with ``epochs`` trials total, reusing
        each channel realization for ``res`` trials (`bamp_model.py:54-58`).
        """
        cfg = self.cfg
        snr_db = ebn0_db + 10 * np.log10(cfg.code_rate)
        snr = 10 ** (snr_db / 10)
        n_real = max(1, int(np.ceil(epochs / res)))
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed), snr_idx)
        snr_dev = jnp.asarray(snr, jnp.float32)  # avoid per-value retracing
        total = None
        if self.two_phase is not None:
            fns = self._two_phase_fns(res, snr_dev=snr_dev, key_base=base)
            keys = [jax.random.fold_in(base, c) for c in range(n_real)]
            # Deferred-fetch: device-accumulated sums, one transfer per
            # point (chunks of 16 bound the dispatch queue and keep the
            # overflow-fallback redo granularity small).
            for c0 in range(0, n_real, 16):
                total = metrics.accumulate(total, run_two_phase_batches(
                    fns, keys[c0:c0 + 16], snr_dev, self._tp_hint))
            out = metrics.finalize(total, cfg)
            self._last_meanT = out["T"]
            return out
        step = self.step_fn(res)
        C = self.chans_per_batch
        n_calls = int(np.ceil(n_real / C))
        for c in range(n_calls):
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(c * C, (c + 1) * C))
            total = metrics.accumulate(total, step(keys, snr_dev))
        out = metrics.finalize(total, cfg)
        self._last_meanT = out["T"]
        return out

    def simulate(self, epochs: int, final: Optional[float] = None,
                 start: Optional[float] = None, step: float = 1.0,
                 res: int = 1, fer_stop: float = 1e-3,
                 resume: bool = False) -> Dict[float, Dict[str, float]]:
        """Sweep the Eb/N0 grid, exporting one JSON per point and stopping
        once ``fer < fer_stop`` (`bamp_model.py:44-67`)."""
        cfg = self.cfg
        if start is None:
            start = int(np.ceil(cfg.shannon_limit_dB))
        if final is None:
            final = start + 20.0
        grid = np.arange(start, final + step, step)
        done = artifacts.load_manifest(self.path)["points"] if resume else {}
        results = {}
        for i, ebn0 in enumerate(grid):
            snr_db = ebn0 + 10 * np.log10(cfg.code_rate)
            if str(float(ebn0)) in done:
                pts = artifacts.load_points(self.path)
                results[float(ebn0)] = pts.get(float(ebn0), {})
                fer = results[float(ebn0)].get("fer", 1.0)
                self.progress(f"EbN0dB={ebn0} (resumed) FER={fer}")
                if fer < fer_stop:
                    break
                continue
            t0 = time.perf_counter()
            avg = self.run_point(ebn0, epochs, res, snr_idx=i)
            dt = time.perf_counter() - t0
            n_trials = self.trials_per_point(epochs, res)
            artifacts.export_point(self.path, ebn0, snr_db, cfg, avg)
            artifacts.update_manifest(self.path, ebn0, n_trials, self.seed)
            results[float(ebn0)] = avg
            self.progress(
                f"EbN0dB={ebn0} FER={avg['fer']:.3e} T={avg['T']:.1f} "
                f"({n_trials} trials, {n_trials / dt:.1f} trials/s)")
            if avg["fer"] < fer_stop:
                break
        return results
