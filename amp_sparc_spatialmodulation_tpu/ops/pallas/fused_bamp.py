"""Fused banded BAMP iteration — Pallas TPU kernels.

One AMP iteration (`/root/reference/bamp.py:59-63`) is four banded linear
maps plus an elementwise chain.  The XLA path (``ops.operators``) runs
them as separate matmul kernels with every intermediate round-tripping
HBM.  These kernels perform one WHOLE iteration per trial tile in a
single pass, entirely in VMEM:

    v     = |H|^2 @ var                  (banded, MXU)
    z'    = H @ xmmse - v * (y - z) / u  (banded + VPU)
    u'    = v + sigma2
    cov   = 1 / (|H|^2^T @ (1/u'))       (banded adjoint, MXU)
    xmap  = xmmse + cov * (H^H @ ((y - z') / u'))

and, in the fully-fused variant (``fuse_denoiser=True``), the K=1
segmented softmax denoiser (`bamp.py:66-77` with one symbol):

    t      = 2 Re(xmap conj(s0)) / cov          (tau/2 calibration)
    segmax = per-segment max of t               (suffix-max via lane rolls
                                                 + indicator-matmul broadcast)
    post   = exp(t - segmax) / seg_sum(exp(t - segmax))
    xmmse' = s0 * post
    var'   = |s0|^2 * post * (1 - post)

so the whole BAMP iteration for OOK-style alphabets is one VMEM-resident
pass — no (B, N) intermediate ever returns to HBM.

Layout: blocks are ``(block_count, B_tile, features)`` — the TRIAL TILE is
the sublane (second-to-last) dimension and the feature dim (``Nt``/``Nr``)
is the lane dimension.  Inside the kernel the leading two dims collapse to
one big ``(Lin*Bt, Nt)`` / ``(Lout*Bt, Nr)`` plane (a free row-major
reshape), so every matmul runs at ``M = Lin*Bt`` — full MXU sublane
utilization instead of per-block ``M = Bt`` slivers — and the band
shift-accumulate is ``Lh`` contiguous row-slice adds.  The per-(tap,
column-block) gains enter as host-precomputed ``(Lin*Bt, Lh*Nr)`` planes
(outer-product expanded, identical for every tile).  State crosses the
kernel as split re/im float32 planes (complex is unsupported in Mosaic).

Matmul precision is ``HIGHEST`` (6-pass f32): the decoders' per-trial
``allclose`` early stop at rtol=1e-5 requires it — bf16 passes leave the
posterior variance fluttering above tolerance, so trials never freeze
(measured: meanT 100/cap vs 11 at the flagship 8 dB point).

Grid: 1-D over trial tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
_DOT1 = dict(preferred_element_type=jnp.float32,
             precision=jax.lax.Precision.DEFAULT)


def _split_bf16(x):
    """Split an f32 plane into (hi, lo) bf16 parts with x ≈ hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot3(x, a):
    """3-pass bf16 matmul — the in-kernel equivalent of
    ``lax.Precision.HIGH`` (which Mosaic's dot lowering rejects): both
    operands split into bf16 hi+lo and the three significant cross terms
    accumulated in f32 on the MXU (the lo·lo term is below f32 ulp).
    Halves the MXU passes of HIGHEST (6) at ~1e-6 relative error."""
    dot = functools.partial(jnp.dot, **_DOT1)
    x_hi, x_lo = _split_bf16(x)
    a_hi, a_lo = _split_bf16(a)
    return dot(x_hi, a_hi) + (dot(x_hi, a_lo) + dot(x_lo, a_hi))


def make_dot(precision):
    """In-kernel dot for a requested precision: HIGHEST lowers natively;
    HIGH maps to the manual 3-pass :func:`dot3`; DEFAULT is 1-pass bf16.

    Strings ('high', 'highest', ...) are canonicalized first — jnp.dot
    accepts them everywhere else, so the kernel must map 'high' to dot3
    too rather than feed native HIGH to Mosaic (which rejects it)."""
    if isinstance(precision, str):
        precision = jax.lax.Precision(precision)
    if precision == jax.lax.Precision.HIGH:
        return dot3
    return functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision)


class NoVmemTileError(ValueError):
    """No trial tile of the requested batch fits the VMEM budget.

    The decoders catch exactly this to fall back to the XLA banded path;
    other ValueErrors (bad kernel arguments, invalid PALLAS_TILE overrides)
    propagate."""


def _band_shift(wp, l, Bt, Lin, Lout, trunc):
    """Tap-``l`` contribution plane: ``wp`` rows (column blocks c) placed at
    their target row blocks ``r = c + l`` (mod Lin if cyclic) in a
    ``(Lout*Bt, Nr)`` plane.  Pure concatenation — no scatter."""
    if trunc == "cyclic":
        main = Lin - l                      # c in [0, main) -> r = c + l
        if l == 0:
            return wp
        return jnp.concatenate([wp[main * Bt:], wp[:main * Bt]], axis=0)
    parts = []
    if l:
        parts.append(jnp.zeros((l * Bt, wp.shape[1]), wp.dtype))
    if trunc == "tail":                     # every c lands (Lout = Lin+Lh-1)
        parts.append(wp)
        pad = Lout - Lin - l
        if pad:
            parts.append(jnp.zeros((pad * Bt, wp.shape[1]), wp.dtype))
    else:                                   # trunc: rows r >= Lout dropped
        parts.append(wp[:(Lin - l) * Bt])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _band_gather(w2d, l, Bt, Lin, Lout, trunc):
    """Tap-``l`` row blocks of the y-side plane seen by each column block
    (rows ``r = c + l``), zero where the row doesn't exist."""
    if trunc == "cyclic":
        if l == 0:
            return w2d
        return jnp.concatenate([w2d[l * Bt:], w2d[:l * Bt]], axis=0)
    if trunc == "tail":
        return w2d[l * Bt:(l + Lin) * Bt]
    keep = Lin - l
    if keep <= 0:
        return jnp.zeros((Lin * Bt, w2d.shape[1]), w2d.dtype)
    if l == 0:
        return w2d
    return jnp.concatenate(
        [w2d[l * Bt:], jnp.zeros((l * Bt, w2d.shape[1]), w2d.dtype)], axis=0)


def _linear_iteration(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
                      S_re, S_im, S_a2, St_re, St_im, St_a2, Gf_s, G2f_s,
                      *, Lin, Lout, Lh, Nt, Nr, Bt, trunc,
                      precision=jax.lax.Precision.HIGHEST,
                      x_precision=None, fold_mode="roll", cmul="gauss",
                      gains_folded=False):
    """One iteration's linear part on the collapsed big planes.

    Inputs are ``(Lin*Bt, Nt)`` x-side / ``(Lout*Bt, Nr)`` y-side values;
    gains come in as host-expanded ``(Lin*Bt, Lh*Nr)`` resident planes
    (in-kernel expansion from (Lin, Lh*Nr) measured 12% slower and did
    not unlock a larger tile — scoped VMEM is dominated by temporaries);
    returns ``(xmap_re, xmap_im, cov, zn_re, zn_im, un)``.

    ``x_precision`` optionally runs the xmap-chain matmuls (Pr/Pi forward,
    adjoint) at a cheaper precision than the variance chain (Pv/cov),
    which must stay at the caller's ``precision`` — the posterior variance
    feeds the 1e-5 allclose early stop.  ``fold_mode`` selects the tap
    lane-group fold: 'rollfirst' (rotate each tap's lane group to lanes
    [0, Nr) BEFORE the row shift, accumulate full-width, slice once — no
    masks, no group iota, Lh+2(Lh-1)+1 VPU ops per plane), 'roll' (the
    round-4 masked shift-accumulate + lane-roll fold) or 'matmul' (the
    round-3 indicator-matmul fold, kept for A/B).

    ``gains_folded=True`` means the per-(tap, column-block) gains were
    folded into the tap planes host-side (possible whenever the gains are
    per-tap constants — every 'tail'/'cyclic' SPARC base matrix: ``W[c+l,
    c] = pdp[l]/mean*Na/Nr`` depends on ``l`` only, `channel.py:80-83`).
    All six per-iteration ``Gf``/``G2f`` full-plane VPU multiplies vanish,
    and for ``cmul='gauss'`` the combo planes arrive host-precomputed in
    the freed slots: ``S_im``<-``S_im_g - S_re_g``, ``Gf_s``<-``S_re_g +
    S_im_g``, ``St_im``<-``-(St_im_g + St_re_g)``, ``G2f_s``<-``St_re_g -
    St_im_g`` (the per-iteration (Nt, Lh*Nr) combo adds vanish too).

    ``xm_im=None`` declares the x-side imaginary part identically zero
    (real alphabets — OOK/BPSK: the segmented posterior mean ``sum_k s_k
    eta_k`` is exactly real when every ``s_k`` is, and the initial prior
    mean is real): the forward complex product loses one of its matmuls
    and all ``xm_im`` elementwise work.
    """
    dot = make_dot(precision)
    dot_x = dot if x_precision is None else make_dot(x_precision)
    Gf, G2f = Gf_s, G2f_s
    # ---- forward: one big matmul per plane, then Lh slice-adds ---------
    Pv = dot(var, S_a2) if gains_folded else G2f * dot(var, S_a2)
    if cmul == "gauss":
        # Gauss 3-multiplication complex product: (a+ib)(c+id) via
        # k1=(a+b)@c, k2=a@(d-c), k3=b@(c+d); re=k1-k3, im=k1+k2.
        # 3 MXU matmuls instead of 4 through the same HIGHEST 6-pass
        # matmul decomposition; the shared-term cancellation gives a
        # slightly different f32 error profile than the 4-multiply form
        # (covered by the kernel-vs-XLA parity tolerances in
        # tests/test_parallel.py) — the stage profiler measures the 10
        # main matmuls as ~82% of the kernel body, so dropping 4 of
        # them to 3 is the cheapest parity-safe MXU saving.  The tap
        # combos are (Nt, Lh*Nr) VPU adds recomputed per iteration
        # unless ``gains_folded`` delivers them precomputed
        # (resident-hoisting cost the VAMP kernel 100M spill slots).
        dmc = S_im if gains_folded else S_im - S_re
        if xm_im is None and gains_folded and S_re.shape[1] > Lh * Nr:
            # Fused forward: k1 and k2 share the LHS (xm_re), so the
            # host stacks their RHS planes at 128-aligned lane offsets
            # ([S_re_g | pad | dmc_g], see _fold_taps) and ONE matmul
            # call produces both — same MXU output tiles, one less
            # per-call fixed cost (the mm/7matmuls floor measured the
            # matmuls at ~46% of the 6-pass roof at M=320: per-call
            # overhead, not MACs, is the margin).
            half = S_re.shape[1] // 2
            k12 = dot_x(xm_re, S_re)
            k1 = k12[:, :Lh * Nr]
            k2 = k12[:, half:half + Lh * Nr]
            Pr, Pi = k1, k1 + k2
        elif xm_im is None:
            # real x: (a)(c+id) = ac + i ad; ad = a@(d-c) + a@c = k2+k1.
            k1 = dot_x(xm_re, S_re)
            k2 = dot_x(xm_re, dmc)
            Pr, Pi = k1, k1 + k2
        else:
            cpd = Gf_s if gains_folded else S_re + S_im
            k1 = dot_x(xm_re + xm_im, S_re)
            k2 = dot_x(xm_re, dmc)
            k3 = dot_x(xm_im, cpd)
            Pr, Pi = k1 - k3, k1 + k2
    else:
        if xm_im is None:
            Pr = dot_x(xm_re, S_re)
            Pi = dot_x(xm_re, S_im)
        else:
            Pr = dot_x(xm_re, S_re) - dot_x(xm_im, S_im)
            Pi = dot_x(xm_im, S_re) + dot_x(xm_re, S_im)
    if not gains_folded:
        Pr, Pi = Gf * Pr, Gf * Pi
    W = Lh * Nr
    if fold_mode == "rollfirst":
        # Per-tap shift-then-roll, NO masks: row-shift the full-width
        # plane first (offset-0 concat — the only form Mosaic's sublane
        # concat accepts), rotate tap group l's lanes to [0, Nr), and
        # accumulate; lanes >= Nr collect other groups' wrapped garbage
        # and are sliced away once.  Rolling per tap BEFORE the
        # accumulation is what removes the 'roll' mode's masks — there
        # the taps were summed into shared lane groups first, so each
        # needed masking.  Lh shifts + (Lh-1) rolls + (Lh-1) adds + 1
        # slice per plane vs 'roll' mode's 3 masks + 3 shifts + 2 adds +
        # 2 rolls + 2 adds + slice (plus its group iota).
        def foldshift(P):
            acc = None
            for l in range(Lh):
                c = _band_shift(P, l, Bt, Lin, Lout, trunc)
                r = c if l == 0 else pltpu.roll(c, shift=W - l * Nr, axis=1)
                acc = r if acc is None else acc + r
            return acc[:, :Nr]

        v = foldshift(Pv)
        hx_re = foldshift(Pr)
        hx_im = foldshift(Pi)
    elif fold_mode == "roll":
        # Masked full-width band shift-accumulate (identical to 'matmul'
        # mode — every concat operand stays at lane offset 0, which Mosaic
        # requires), then fold the Lh lane groups with (Lh-1)*3 VPU lane
        # rolls instead of the three (W->128-padded) x (Nr->128-padded)
        # indicator matmuls.  The rolled operands carry lane-offset
        # layouts, so they must only feed elementwise adds + a leading
        # slice (Mosaic relayouts those; it cannot sublane-concat them —
        # the reason the shift must happen BEFORE the fold).
        group = jax.lax.broadcasted_iota(jnp.int32, (Lin * Bt, W), 1) // Nr
        acc_v = acc_re = acc_im = None
        for l in range(Lh):
            m = group == l
            cv = _band_shift(jnp.where(m, Pv, 0.0), l, Bt, Lin, Lout, trunc)
            cr = _band_shift(jnp.where(m, Pr, 0.0), l, Bt, Lin, Lout, trunc)
            ci = _band_shift(jnp.where(m, Pi, 0.0), l, Bt, Lin, Lout, trunc)
            acc_v = cv if acc_v is None else acc_v + cv
            acc_re = cr if acc_re is None else acc_re + cr
            acc_im = ci if acc_im is None else acc_im + ci

        def lanefold(acc):
            s = acc
            for l in range(1, Lh):
                s = s + pltpu.roll(acc, shift=W - l * Nr, axis=1)
            return s[:, :Nr]

        v = lanefold(acc_v)
        hx_re = lanefold(acc_re)
        hx_im = lanefold(acc_im)
    else:
        # Band shift-accumulate without lane-offset slices (Mosaic cannot
        # sublane-concat them): mask each tap's lane group elementwise,
        # shift rows with full-width concats (all at lane offset 0), and
        # fold the Lh lane groups with a small indicator matmul at the end.
        group = jax.lax.broadcasted_iota(jnp.int32, (Lin * Bt, W), 1) // Nr
        acc_v = acc_re = acc_im = None
        for l in range(Lh):
            m = group == l
            cv = _band_shift(jnp.where(m, Pv, 0.0), l, Bt, Lin, Lout, trunc)
            cr = _band_shift(jnp.where(m, Pr, 0.0), l, Bt, Lin, Lout, trunc)
            ci = _band_shift(jnp.where(m, Pi, 0.0), l, Bt, Lin, Lout, trunc)
            acc_v = cv if acc_v is None else acc_v + cv
            acc_re = cr if acc_re is None else acc_re + cr
            acc_im = ci if acc_im is None else acc_im + ci
        # (W, Nr) lane-fold indicator: R[l*Nr + j, j] = 1
        fold = (jax.lax.broadcasted_iota(jnp.int32, (W, Nr), 0) % Nr
                == jax.lax.broadcasted_iota(jnp.int32, (W, Nr), 1)
                ).astype(jnp.float32)
        v = dot(acc_v, fold)
        hx_re = dot(acc_re, fold)
        hx_im = dot(acc_im, fold)

    # ---- Onsager residual + variances (`bamp.py:60-61`) ----------------
    w = v / u
    zn_re = hx_re - w * (y_re - z_re)
    zn_im = hx_im - w * (y_im - z_im)
    un = v + sigma2

    # ---- backward: assemble Z planes, one big matmul each --------------
    uinv = 1.0 / un
    rr = (y_re - zn_re) * uinv
    ri = (y_im - zn_im) * uinv
    Zc = jnp.concatenate(
        [_band_gather(uinv, l, Bt, Lin, Lout, trunc) for l in range(Lh)],
        axis=1)
    Zr = jnp.concatenate(
        [_band_gather(rr, l, Bt, Lin, Lout, trunc) for l in range(Lh)],
        axis=1)
    Zi = jnp.concatenate(
        [_band_gather(ri, l, Bt, Lin, Lout, trunc) for l in range(Lh)],
        axis=1)
    if gains_folded:
        cov = 1.0 / dot(Zc, St_a2)                  # (Lin*Bt, Nt)
        A, Bp = Zr, Zi
    else:
        cov = 1.0 / dot(G2f * Zc, St_a2)
        A, Bp = Gf * Zr, Gf * Zi
    if cmul == "gauss":
        # adjoint wants re=A@c+B@d, im=B@c-A@d — the forward identity
        # with d -> -d: k1=(A+B)@c, k2=A@(-d-c), k3=B@(c-d).
        amc = St_im if gains_folded else -St_im - St_re
        adm = G2f_s if gains_folded else St_re - St_im
        k1 = dot_x(A + Bp, St_re)
        k2 = dot_x(A, amc)
        k3 = dot_x(Bp, adm)
        adj_re = k1 - k3
        adj_im = k1 + k2
    else:
        adj_re = dot_x(A, St_re) + dot_x(Bp, St_im)
        adj_im = dot_x(Bp, St_re) - dot_x(A, St_im)
    xmap_im = (cov * adj_im if xm_im is None
               else xm_im + cov * adj_im)
    return (xm_re + cov * adj_re, xmap_im, cov,
            zn_re, zn_im, un)


def _x2d(ref, Bt, Nt):
    return ref[:].reshape(-1, Nt)


def _iteration_kernel(sigma2_ref, xm_re_ref, xm_im_ref, var_ref,
                      z_re_ref, z_im_ref, u_ref, y_re_ref, y_im_ref,
                      S_re_ref, S_im_ref, S_a2_ref,
                      St_re_ref, St_im_ref, St_a2_ref, Gf_ref, G2f_ref,
                      xmap_re_ref, xmap_im_ref, cov_ref,
                      zn_re_ref, zn_im_ref, un_ref,
                      *, Lin, Lout, Lh, Nt, Nr, Bt, trunc):
    """Linear part of one iteration; denoiser stays outside (general K)."""
    xmap_re, xmap_im, cov, zn_re, zn_im, un = _linear_iteration(
        sigma2_ref[0],
        _x2d(xm_re_ref, Bt, Nt), _x2d(xm_im_ref, Bt, Nt),
        _x2d(var_ref, Bt, Nt),
        _x2d(z_re_ref, Bt, Nr), _x2d(z_im_ref, Bt, Nr),
        _x2d(u_ref, Bt, Nr), _x2d(y_re_ref, Bt, Nr), _x2d(y_im_ref, Bt, Nr),
        S_re_ref[:], S_im_ref[:], S_a2_ref[:],
        St_re_ref[:], St_im_ref[:], St_a2_ref[:], Gf_ref[:], G2f_ref[:],
        Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr, Bt=Bt, trunc=trunc)
    xmap_re_ref[:] = xmap_re.reshape(Lin, Bt, Nt)
    xmap_im_ref[:] = xmap_im.reshape(Lin, Bt, Nt)
    cov_ref[:] = cov.reshape(Lin, Bt, Nt)
    zn_re_ref[:] = zn_re.reshape(Lout, Bt, Nr)
    zn_im_ref[:] = zn_im.reshape(Lout, Bt, Nr)
    un_ref[:] = un.reshape(Lout, Bt, Nr)


def _segment_reduce_mats(Nt: int, M: int):
    """(Nt, Na) segment indicator and its transpose, built in-kernel from
    iota (Pallas kernels cannot capture array constants)."""
    Na = Nt // M
    rows = jax.lax.broadcasted_iota(jnp.int32, (Nt, Na), 0) // M
    cols = jax.lax.broadcasted_iota(jnp.int32, (Nt, Na), 1)
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (Na, Nt), 1) // M
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (Na, Nt), 0)
    return ((rows == cols).astype(jnp.float32),
            (rows_t == cols_t).astype(jnp.float32))


def _seg_reduce_bcast(x, *, Nt, M, pos, op="sum", mode="roll"):
    """Per-segment reduction of a (rows, Nt) plane, broadcast back over
    each segment — exact for ANY segment size M.

    'roll': doubling suffix-reduce (lane rolls masked at the segment
    boundary; exact for sum because the masked ranges tile without
    overlap) followed by a doubling forward broadcast of the pos-0 head —
    ``2*ceil(log2 M)`` VPU lane rolls, no matmul.  'matmul': the round-3
    design — suffix-reduce then two indicator matmuls whose (Nt, Na) /
    (Na, Nt) operands lane-pad Na up to 128 (16x MXU waste at the
    flagship Na=8); kept for A/B.

    The sum reduction is an exact 0/1-weighted segment total either way —
    it feeds the 1e-5 allclose convergence test, so no precision knob.
    """
    if op == "sum" and mode == "matmul":
        # the indicator matmul sums the segment directly — no suffix pass
        dot = functools.partial(jnp.dot, **_DOT)
        Sind, SindT = _segment_reduce_mats(Nt, M)
        return dot(dot(x, Sind), SindT)
    acc = x
    j = 1
    while j < M:
        # left-roll by j == cyclic roll by Nt - j (shift must be >= 0)
        rolled = pltpu.roll(acc, shift=Nt - j, axis=1)
        if op == "sum":
            acc = jnp.where(pos + j < M, acc + rolled, acc)
        else:
            acc = jnp.where(pos + j < M, jnp.maximum(acc, rolled), acc)
        j *= 2
    if mode == "matmul":
        dot = functools.partial(jnp.dot, **_DOT)
        Sind, SindT = _segment_reduce_mats(Nt, M)
        head = jnp.where(pos == 0, acc, 0.0)
        return dot(dot(head, Sind), SindT)
    # Forward broadcast of the head value: right-roll by doubling powers,
    # taking max against a dominated sentinel (segment sums are >= 1 —
    # they contain exp(0) at the maximizing lane — and the suffix-max head
    # dominates -3e38), masked so lanes only receive from their own
    # segment (source lane p - j stays in-segment exactly when pos >= j).
    out = jnp.where(pos == 0, acc, 0.0 if op == "sum" else -3e38)
    j = 1
    while j < M:
        rolled = pltpu.roll(out, shift=j, axis=1)
        out = jnp.where(pos >= j, jnp.maximum(out, rolled), out)
        j *= 2
    return out


def _seg_denoiser(xr, xi, cov, *, Nt, M, sym_re, sym_im, want_var=True,
                  halve=True, segred="roll", var_form="decomposed"):
    """General-K segmented softmax posterior on a (rows, Nt) plane
    (`bamp.py:66-77`, tau = cov/2) with the decomposed variance
    (`bamp.py:74-76`) — the in-kernel twin of
    :func:`...denoise.segmented_posterior` (symbols unrolled statically;
    K is small: 1 for OOK ... 8 for 8PSK).  ``want_var=False`` gives the
    mean-only form SCAMP uses (`scamp.py:61-68`); ``halve=False`` drops
    the tau/2 calibration (VAMP, `vamp.py:110`); ``var_form=
    'second_moment'`` is vamp2's E|x|^2 - |xmmse|^2 (`vamp2.py:87`).
    ``cov`` broadcasts ((rows, 1) per-trial scalars or full (rows, Nt)
    planes).  Segment reductions are exact 0/1 sums either way (they
    feed the 1e-5 allclose convergence test); ``segred`` picks rolls vs
    indicator matmuls."""
    rows = xr.shape[0]
    real_x = xi is None
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, Nt), 1) % M
    inv = (2.0 if halve else 1.0) / cov
    # Real alphabets (every sym_im == 0) with a real x-side (``xi=None``)
    # drop every imaginary elementwise op; the output ``xm_im`` is None
    # (exactly what ``sum_k s_k eta_k`` would give — identical zeros).
    ts = [xr * sr * inv if real_x else (xr * sr + xi * si) * inv
          for sr, si in zip(sym_re, sym_im)]
    m_lane = ts[0]
    for tk in ts[1:]:
        m_lane = jnp.maximum(m_lane, tk)
    segmax = _seg_reduce_bcast(m_lane, Nt=Nt, M=M, pos=pos, op="max",
                               mode=segred)
    etas = [jnp.exp(tk - segmax) for tk in ts]
    lane_sum = etas[0]
    for e in etas[1:]:
        lane_sum = lane_sum + e
    eta2 = _seg_reduce_bcast(lane_sum, Nt=Nt, M=M, pos=pos, op="sum",
                             mode=segred)         # per-segment totals >= 1
    xm_re = sym_re[0] * etas[0]
    xm_im = None if real_x else sym_im[0] * etas[0]
    for sr, si, e in zip(sym_re[1:], sym_im[1:], etas[1:]):
        xm_re = xm_re + sr * e
        if not real_x:
            xm_im = xm_im + si * e
    xm_re = xm_re / eta2
    if not real_x:
        xm_im = xm_im / eta2
    mag2 = (xm_re * xm_re if real_x
            else xm_re * xm_re + xm_im * xm_im)
    if not want_var:
        return xm_re, xm_im, None
    if var_form == "second_moment":
        second = None
        for sr, si, e in zip(sym_re, sym_im, etas):
            m2 = (sr * sr + si * si) * e
            second = m2 if second is None else second + m2
        return xm_re, xm_im, second / eta2 - mag2
    var0 = mag2 * (1.0 - lane_sum / eta2)
    vars_ = None
    for sr, si, e in zip(sym_re, sym_im, etas):
        d = ((xm_re - sr) ** 2 if real_x
             else (xm_re - sr) ** 2 + (xm_im - si) ** 2)
        vars_ = d * e if vars_ is None else vars_ + d * e
    return xm_re, xm_im, var0 + vars_ / eta2


_EXP_MAX = float(np.log(np.finfo(np.float32).max)) - 1.0
_ZERO_TOL = 1e-9


def _mix_denoiser(xr, xi, cov, *, sym_re, sym_im, Ps, P0):
    """i.i.d. Bernoulli-symbol-mixture posterior on a (rows, Nt) plane —
    the in-kernel twin of :func:`...denoise.bernoulli_mixture_posterior`
    (`bamp.py:79-97`): ``p(x) = P0 delta(x) + Ps sum_k delta(x - s_k)``
    under a Gaussian likelihood of variance ``cov``.  Purely lane-local
    (no segment reductions), symbols unrolled statically."""
    # Real alphabets (every sym_im == 0): the Gaussian likelihood still
    # needs the full |x|^2 (the INPUT xi stays), but the posterior-mean
    # imaginary part ``Ps sum_k s_im g_k / norm`` is identically zero —
    # its elementwise chain is dropped and ``m_im`` returns None.
    real_sym = all(float(si) == 0.0 for si in sym_im)
    inv = 1.0 / cov
    xi2 = xi * xi                   # shared across symbols when real_sym
    e0 = jnp.exp(-jnp.minimum((xr * xr + xi2) * inv, _EXP_MAX))
    gs = [jnp.exp(-jnp.minimum(
        (((xr - sr) ** 2 + xi2) if real_sym
         else (xr - sr) ** 2 + (xi - si) ** 2) * inv, _EXP_MAX))
        for sr, si in zip(sym_re, sym_im)]
    gsum = gs[0]
    for g in gs[1:]:
        gsum = gsum + g
    norm = P0 * e0 + Ps * gsum
    norm = jnp.where(norm == 0.0, _ZERO_TOL, norm)
    m_re = sym_re[0] * gs[0]
    m_im = None if real_sym else sym_im[0] * gs[0]
    second = (sym_re[0] ** 2 + sym_im[0] ** 2) * gs[0]
    for sr, si, g in zip(sym_re[1:], sym_im[1:], gs[1:]):
        m_re = m_re + sr * g
        if not real_sym:
            m_im = m_im + si * g
        second = second + (sr * sr + si * si) * g
    m_re = Ps * m_re / norm
    mag2 = m_re * m_re
    if not real_sym:
        m_im = Ps * m_im / norm
        mag2 = mag2 + m_im * m_im
    var = Ps * second / norm - mag2
    return m_re, m_im, var


def _k1_denoiser(xr, xi, cov, *, Nt, M, s0_re, s0_im, segred="roll"):
    """K=1 segmented softmax posterior on a (rows, Nt) plane
    (`bamp.py:66-77`, tau = cov/2; var simplifies to |s0|^2 p (1-p))."""
    rows = xr.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, Nt), 1) % M
    t = 2.0 * (xr * s0_re + xi * s0_im) / cov
    segmax = _seg_reduce_bcast(t, Nt=Nt, M=M, pos=pos, op="max",
                               mode=segred)
    eta = jnp.exp(t - segmax)                     # <= 1
    eta2 = _seg_reduce_bcast(eta, Nt=Nt, M=M, pos=pos, op="sum",
                             mode=segred)         # segment sums >= 1
    post = eta / eta2
    var = (s0_re * s0_re + s0_im * s0_im) * post * (1.0 - post)
    return s0_re * post, s0_im * post, var


def _iteration_fused_kernel(sigma2_ref, act_ref, xm_re_ref, xm_im_ref,
                            var_ref, z_re_ref, z_im_ref, u_ref,
                            y_re_ref, y_im_ref,
                            S_re_ref, S_im_ref, S_a2_ref,
                            St_re_ref, St_im_ref, St_a2_ref,
                            Gf_ref, G2f_ref,
                            xmap_re_ref, xmap_im_ref,
                            xn_re_ref, xn_im_ref, varn_ref,
                            zn_re_ref, zn_im_ref, un_ref, notok_ref,
                            *, Lin, Lout, Lh, Nt, Nr, Bt, trunc,
                            M, s0_re, s0_im):
    """Whole BAMP iteration incl. the K=1 segmented denoiser, per-trial
    FREEZE (state of converged trials passes through unchanged — enabling
    in-place input/output buffer aliasing) and the convergence test
    (``notok`` = per-(block, trial) count of variance entries outside the
    allclose tolerance; the driver reduces it over blocks)."""
    xm_re, xm_im = _x2d(xm_re_ref, Bt, Nt), _x2d(xm_im_ref, Bt, Nt)
    var = _x2d(var_ref, Bt, Nt)
    z_re, z_im = _x2d(z_re_ref, Bt, Nr), _x2d(z_im_ref, Bt, Nr)
    u = _x2d(u_ref, Bt, Nr)
    xmap_re, xmap_im, cov, zn_re, zn_im, un = _linear_iteration(
        sigma2_ref[0], xm_re, xm_im, var, z_re, z_im, u,
        _x2d(y_re_ref, Bt, Nr), _x2d(y_im_ref, Bt, Nr),
        S_re_ref[:], S_im_ref[:], S_a2_ref[:],
        St_re_ref[:], St_im_ref[:], St_a2_ref[:], Gf_ref[:], G2f_ref[:],
        Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr, Bt=Bt, trunc=trunc)
    xn_re, xn_im, varn = _k1_denoiser(xmap_re, xmap_im, cov, Nt=Nt, M=M,
                                      s0_re=s0_re, s0_im=s0_im)
    # per-trial torch.allclose(var_new, var_old) residual count (`bamp.py:140`)
    bad = jnp.abs(varn - var) > 1e-8 + 1e-5 * jnp.abs(var)
    notok = jnp.sum(bad.astype(jnp.float32), axis=1, keepdims=True)
    # freeze: converged trials keep their previous state (act: 1.0/0.0)
    act = act_ref[:]                                  # (Bt, 1)
    mx = jnp.concatenate([act] * Lin, axis=0)         # (Lin*Bt, 1)
    my = jnp.concatenate([act] * Lout, axis=0)        # (Lout*Bt, 1)
    # Comparison select, NOT m*new + (1-m)*old: the multiplicative form
    # propagates non-finite values from the discarded branch (0*Inf=NaN),
    # which would corrupt frozen state if a recomputed plane ever overflowed.
    sel = lambda m, new, old: jnp.where(m > 0.0, new, old)
    xmap_re_ref[:] = xmap_re.reshape(Lin, Bt, Nt)
    xmap_im_ref[:] = xmap_im.reshape(Lin, Bt, Nt)
    xn_re_ref[:] = sel(mx, xn_re, xm_re).reshape(Lin, Bt, Nt)
    xn_im_ref[:] = sel(mx, xn_im, xm_im).reshape(Lin, Bt, Nt)
    varn_ref[:] = sel(mx, varn, var).reshape(Lin, Bt, Nt)
    zn_re_ref[:] = sel(my, zn_re, z_re).reshape(Lout, Bt, Nr)
    zn_im_ref[:] = sel(my, zn_im, z_im).reshape(Lout, Bt, Nr)
    un_ref[:] = sel(my, un, u).reshape(Lout, Bt, Nr)
    notok_ref[:] = notok.reshape(Lin, Bt, 1)


def _decode_kernel(sigma2_ref, cap_ref, act_ref, T_ref,
                   xmap_re_ref, xmap_im_ref, xm_re_ref, xm_im_ref, var_ref,
                   z_re_ref, z_im_ref, u_ref, y_re_ref, y_im_ref,
                   S_re_ref, S_im_ref, S_a2_ref,
                   St_re_ref, St_im_ref, St_a2_ref, Gf_ref, G2f_ref,
                   xmap_re_o, xmap_im_o, xn_re_o, xn_im_o, varn_o,
                   zn_re_o, zn_im_o, un_o, act_o, T_o,
                   *, Lin, Lout, Lh, Nt, Nr, Bt, trunc, M, sym_re, sym_im,
                   precision=jax.lax.Precision.HIGHEST,
                   den="seg", Ps=0.0, P0=0.0,
                   x_precision=None, fold_mode="roll", segred="roll",
                   cmul="gauss", gains_folded=False, real_x=False):
    """The WHOLE BAMP decode for one trial tile in a single kernel: an
    in-kernel ``while_loop`` runs complete iterations (linear maps +
    segmented denoiser + per-trial freeze + convergence) with all state
    resident in VMEM, exiting when every trial of the TILE converged or
    ``cap`` iterations ran.  This removes the ~100us/iteration dispatch
    chain of the one-kernel-per-iteration design AND replaces the global
    batch-max trip count with the (smaller) per-tile max — each tile stops
    at its own slowest trial (`bamp.py:136-141` semantics, per-trial ``T``
    preserved exactly via the in-loop active mask).

    ``cap`` is the REMAINING iteration budget (SMEM scalar, so one
    compilation serves both two-phase phases at a given batch shape).

    ``real_x=True`` (real alphabets — every ``sym_im == 0``): the
    x-side posterior mean is exactly real at every iteration (the
    denoiser mean is a real-weighted sum of real symbols and the initial
    prior mean is real), so ``xm_im`` leaves the loop carry entirely —
    the forward complex product loses one matmul and the denoiser its
    imaginary elementwise chain; the ``xn_im`` output (and its aliased
    input) is pinned to zeros.  Bit-identical to the general path: every
    dropped op had an exactly-zero operand.
    """
    sigma2 = sigma2_ref[0]
    cap = cap_ref[0]
    y_re, y_im = _x2d(y_re_ref, Bt, Nr), _x2d(y_im_ref, Bt, Nr)
    taps = (S_re_ref[:], S_im_ref[:], S_a2_ref[:],
            St_re_ref[:], St_im_ref[:], St_a2_ref[:], Gf_ref[:], G2f_ref[:])
    geom = dict(Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr, Bt=Bt, trunc=trunc,
                precision=precision, x_precision=x_precision,
                fold_mode=fold_mode, cmul=cmul, gains_folded=gains_folded)
    init = (jnp.int32(0), act_ref[:], T_ref[:],
            _x2d(xmap_re_ref, Bt, Nt), _x2d(xmap_im_ref, Bt, Nt),
            _x2d(xm_re_ref, Bt, Nt))
    init += () if real_x else (_x2d(xm_im_ref, Bt, Nt),)
    init += (_x2d(var_ref, Bt, Nt),
             _x2d(z_re_ref, Bt, Nr), _x2d(z_im_ref, Bt, Nr),
             _x2d(u_ref, Bt, Nr))

    def cond(c):
        return jnp.logical_and(c[0] < cap, jnp.sum(c[1]) > 0.0)

    def body(c):
        if real_x:
            t, act, T, xmap_re, xmap_im, xm_re, var, z_re, z_im, u = c
            xm_im = None
        else:
            (t, act, T, xmap_re, xmap_im, xm_re, xm_im, var,
             z_re, z_im, u) = c
        xr, xi, cov, zn_re, zn_im, un = _linear_iteration(
            sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
            *taps, **geom)
        if den == "mix":
            dn_re, dn_im, varn = _mix_denoiser(xr, xi, cov, sym_re=sym_re,
                                               sym_im=sym_im, Ps=Ps, P0=P0)
        else:
            dn_re, dn_im, varn = _seg_denoiser(
                xr, None if real_x else xi, cov, Nt=Nt, M=M,
                sym_re=sym_re, sym_im=sym_im, segred=segred)
        # per-trial torch.allclose(var_new, var_old) (`bamp.py:140`):
        # tree-fold the Lin block rows (ceil(log2 Lin) slice-adds instead
        # of Lin-1 sequential ones).
        bad = (jnp.abs(varn - var)
               > 1e-8 + 1e-5 * jnp.abs(var)).astype(jnp.float32)
        nb = bad.sum(axis=1, keepdims=True)          # (Lin*Bt, 1)
        blocks = Lin
        while blocks > 1:
            half = blocks // 2
            tail = nb[(blocks - half) * Bt:blocks * Bt]
            nb = nb[:(blocks - half) * Bt]
            nb = jnp.concatenate(
                [nb[:half * Bt] + tail, nb[half * Bt:]], axis=0) \
                if blocks % 2 else nb + tail
            blocks -= half
        notok = nb                                   # (Bt, 1)
        mx = jnp.concatenate([act] * Lin, axis=0)
        my = jnp.concatenate([act] * Lout, axis=0)
        sel = lambda m, new, old: jnp.where(m > 0.0, new, old)
        out = (t + 1,
               act * (notok > 0.0).astype(jnp.float32),
               T + act,
               sel(mx, xr, xmap_re), sel(mx, xi, xmap_im),
               sel(mx, dn_re, xm_re))
        if not real_x:
            out += (sel(mx, dn_im, xm_im),)
        return out + (sel(mx, varn, var),
                      sel(my, zn_re, z_re), sel(my, zn_im, z_im),
                      sel(my, un, u))

    c = jax.lax.while_loop(cond, body, init)
    if real_x:
        _, act, T, xmap_re, xmap_im, xm_re, var, z_re, z_im, u = c
        xn_im_o[:] = jnp.zeros((Lin, Bt, Nt), jnp.float32)
    else:
        _, act, T, xmap_re, xmap_im, xm_re, xm_im, var, z_re, z_im, u = c
        xn_im_o[:] = xm_im.reshape(Lin, Bt, Nt)
    act_o[:] = act
    T_o[:] = T
    xmap_re_o[:] = xmap_re.reshape(Lin, Bt, Nt)
    xmap_im_o[:] = xmap_im.reshape(Lin, Bt, Nt)
    xn_re_o[:] = xm_re.reshape(Lin, Bt, Nt)
    varn_o[:] = var.reshape(Lin, Bt, Nt)
    zn_re_o[:] = z_re.reshape(Lout, Bt, Nr)
    zn_im_o[:] = z_im.reshape(Lout, Bt, Nr)
    un_o[:] = u.reshape(Lout, Bt, Nr)


def _pick_tile(B: int, n_x: int, n_y: int, Lin: int, Lout: int,
               Nt: int, Nr: int) -> int:
    """Largest trial tile (sublane dim, multiple of 8) whose working set
    fits VMEM.

    ``n_x``/``n_y`` count the blocked x-side / y-side planes (inputs +
    outputs).  When the grid has more than one program, Pallas
    double-buffers the grid-dependent blocks (pipelined prefetch), so the
    budget must cover TWO copies of every blocked operand.
    """
    import os
    import warnings
    override = os.environ.get("PALLAS_TILE")  # perf-tuning experiments
    if override:
        t = int(override)
        # The override bypasses the VMEM-fit budget by design (that is the
        # experiment), but never the hard layout constraints: Mosaic needs
        # the sublane dim a multiple of 8 and the grid must cover B.
        if t % 8 != 0:
            raise ValueError(f"PALLAS_TILE={t} must be a multiple of 8 "
                             "(Mosaic sublane constraint)")
        if B % t != 0:
            raise ValueError(f"PALLAS_TILE={t} must divide the trial "
                             f"batch {B}")
        warnings.warn(f"PALLAS_TILE={t} overrides the VMEM-fit tile "
                      "search (perf experiment knob)", stacklevel=3)
        return t
    budget = 11 * 1024 * 1024
    lane = lambda d: -(-d // 128) * 128       # Mosaic pads lanes to 128
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if B % tile != 0:
            continue
        xside = n_x * tile * Lin * lane(Nt) * 4
        yside = n_y * tile * Lout * lane(Nr) * 4
        mult = 1 if tile == B else 2          # double-buffered when grid > 1
        if mult * (xside + yside) < budget:
            return tile
    return 0


def _call(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
          S_re, S_im, S_a2, Gf, G2f, geom, interpret, denoise_args=None,
          act=None):
    Lin, Lout, Lh, Nt, Nr, tile, trunc = geom
    B = xm_re.shape[1]
    grid = (B // tile,)

    def xspec():
        return pl.BlockSpec((Lin, tile, Nt), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def yspec():
        return pl.BlockSpec((Lout, tile, Nr), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x_shape = jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32)
    y_shape = jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32)
    static = dict(Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr, Bt=tile,
                  trunc=trunc)
    state_specs = [xspec(), xspec(), xspec(), yspec(), yspec(), yspec(),
                   yspec(), yspec(), full(), full(), full(), full(),
                   full(), full(), full(), full()]  # state, y, taps, gains
    if denoise_args is None:
        kern = functools.partial(_iteration_kernel, **static)
        # xmap re/im, cov, z re/im, u
        out_shape = [x_shape] * 3 + [y_shape] * 3
        out_specs = [xspec()] * 3 + [yspec()] * 3
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + state_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=14 * 1024 * 1024),
            interpret=interpret,
        )(sigma2, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
          S_re, S_im, S_a2, S_re.T, S_im.T, S_a2.T, Gf, G2f)

    M, s0_re, s0_im = denoise_args
    kern = functools.partial(_iteration_fused_kernel, **static,
                             M=M, s0_re=s0_re, s0_im=s0_im)
    if act is None:
        act = jnp.ones((B, 1), jnp.float32)
    aspec = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((Lin, tile, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    # xmap re/im, xmmse re/im, var, z re/im, u, notok
    out_shape = ([x_shape] * 5 + [y_shape] * 3
                 + [jax.ShapeDtypeStruct((Lin, B, 1), jnp.float32)])
    out_specs = [xspec()] * 5 + [yspec()] * 3 + [nspec]
    # In-place state update: frozen trials pass through in-kernel, so the
    # six carried planes can reuse their input buffers (no loop copies).
    aliases = {2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7}
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), aspec]
        + state_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=interpret,
    )(sigma2, act, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
      S_re, S_im, S_a2, S_re.T, S_im.T, S_a2.T, Gf, G2f)


class _PlaneKernelBase:
    """Shared plumbing of the plane-layout kernels: block-major layout
    transforms and the resident tap/gain planes for a fixed banded
    operator and trial tile."""

    def _setup(self, op, tile: int):
        self.op = op
        self.geom = (op.Lin, op.Lout, op.Lh, op.Nt, op.Nr, tile, op.trunc)
        self.S_re = jnp.real(op.h_stack)
        self.S_im = jnp.imag(op.h_stack)
        self.S_a2 = op.abs_h2_stack
        # (Lin*tile, Lh*Nr) outer-product gain planes: row block c (tile
        # rows), column group l holds gains[l, c]; identical per tile.
        # jnp ops: gains may be traced (operator built inside a jit).
        g = jnp.asarray(op.gains, jnp.float32)        # (Lh, Lin)
        gf = jnp.repeat(jnp.repeat(g.T, tile, axis=0), op.Nr, axis=1)
        self.Gf = gf
        self.G2f = gf * gf

    def _gains_per_tap(self):
        """(Lh,) per-tap gains when every column block shares them, else
        None.  True for every 'tail'/'cyclic' SPARC base matrix —
        ``W[c+l, c] = pdp[l]/mean * Na/Nr`` depends on the tap only
        (`channel.py:80-83`) — and for the unit-gain Toeplitz channel;
        only 'trunc' truncation (dropped rows zero some gains) and
        custom column-dependent allocations fall back.  Needs concrete
        (non-traced) gains; operators keep them host-side numpy."""
        g = self.op.gains
        if isinstance(g, np.ndarray):
            gh = np.asarray(g, np.float32)
        elif getattr(g, "aval", None) is not None and not isinstance(
                g, jax.core.Tracer):
            gh = np.asarray(g, np.float32)     # concrete device constant
        else:
            return None
        if gh.size and np.all(gh == gh[:, :1]):
            return gh[:, 0]
        return None

    def _fold_taps(self, cmul: str, real_x: bool = False):
        """Pre-scale the tap planes by the per-tap gains and (for the
        Gauss complex product) pre-build the combo planes, so the kernel
        skips all six per-iteration gain multiplies and four combo adds.
        Returns the 8-tuple filling the kernel's tap/gain slots; see
        ``_linear_iteration(gains_folded=True)`` for the slot map.

        ``real_x`` + gauss additionally stacks the two forward RHS
        planes at 128-aligned lane offsets ([S_re_g | pad | dmc_g]) so
        the forward runs as ONE fused matmul call (same output tiles)."""
        gl = self._gains_per_tap()
        assert gl is not None
        lane = np.repeat(gl, self.op.Nr)[None, :]     # (1, Lh*Nr)
        S_re_g = self.S_re * lane
        S_im_g = self.S_im * lane
        S_a2_g2 = self.S_a2 * (lane * lane)
        St_re_g, St_im_g, St_a2_g2 = S_re_g.T, S_im_g.T, S_a2_g2.T
        dummy = jnp.zeros((8, 128), jnp.float32)
        if cmul == "gauss" and real_x:
            W = S_re_g.shape[1]
            wpad = -(-W // 128) * 128
            z = jnp.zeros((S_re_g.shape[0], wpad - W), jnp.float32)
            stacked = jnp.concatenate(
                [S_re_g, z, S_im_g - S_re_g, z], axis=1)
            return (stacked, dummy, S_a2_g2,
                    St_re_g, -St_im_g - St_re_g, St_a2_g2,
                    dummy, St_re_g - St_im_g)
        if cmul == "gauss":
            return (S_re_g, S_im_g - S_re_g, S_a2_g2,
                    St_re_g, -St_im_g - St_re_g, St_a2_g2,
                    S_re_g + S_im_g, St_re_g - St_im_g)
        return (S_re_g, S_im_g, S_a2_g2, St_re_g, St_im_g, St_a2_g2,
                dummy, dummy)

    def _to_x(self, a):
        """(B, Lin*Nt) -> (Lin, B, Nt)."""
        B = a.shape[0]
        return a.reshape(B, self.op.Lin, self.op.Nt).transpose(1, 0, 2)

    def _to_y(self, a):
        B = a.shape[0]
        return a.reshape(B, self.op.Lout, self.op.Nr).transpose(1, 0, 2)

    def _from_x(self, a):
        return a.transpose(1, 0, 2).reshape(a.shape[1], -1)

    def _from_y(self, a):
        return a.transpose(1, 0, 2).reshape(a.shape[1], -1)


class FusedBandedDecode(_PlaneKernelBase):
    """One ``pallas_call`` per BAMP decode (multi-iteration fusion).

    Wraps :func:`_decode_kernel`: the whole iteration loop — the four
    banded linear maps, the general-K segmented denoiser, per-trial
    freeze, convergence test and per-trial ``T`` bookkeeping — runs inside
    the kernel with all state VMEM-resident, one grid program per trial
    tile.  Each tile exits at its own slowest trial, so the trip count is
    the per-tile max instead of the global batch max, and the
    per-iteration kernel-dispatch overhead vanishes.  Covers every complex
    segmented alphabet (OOK/QPSK/8PSK/...; symbols unrolled statically,
    any segment size M).

    Resumable: takes (act, T, cap_remaining) so two-phase continuation
    batching composes — the trajectory is identical to the XLA path's
    ``lax.while_loop`` (`/root/reference/bamp.py:136-141` semantics).
    """

    @classmethod
    def covers(cls, cfg) -> bool:
        """Semantic coverage: can this kernel decode ``cfg`` at all?

        Segmented/sparc complex alphabets (any K, any M — the in-kernel
        general-K softmax) and the random generator mode (the in-kernel
        Bernoulli-mixture denoiser).  Geometry fit is :meth:`fits`."""
        seg = (cfg.mode in ("segmented", "sparc") and cfg.is_complex
               and cfg.M > 0)
        mix = cfg.mode == "random" and cfg.is_complex
        return seg or mix

    @classmethod
    def fits(cls, cfg, batch: int) -> bool:
        """True if a VMEM trial tile exists for this geometry/batch —
        the same ``_pick_tile`` call the constructor makes, so 'auto'
        resolution can never drift from what the constructor accepts."""
        return _pick_tile(batch, 10 + 2 * cfg.K, 9, cfg.Lin, cfg.Lout,
                          cfg.Nt, cfg.Nr) > 0

    def __init__(self, op, batch: int, interpret: bool = False,
                 symbols=None, M: int = 0,
                 precision=jax.lax.Precision.HIGHEST,
                 den: str = "seg", Ps: float = 0.0, P0: float = 0.0):
        import os
        if symbols is None or len(symbols) < 1:
            raise ValueError("whole-decode kernel needs a symbol table")
        if den not in ("seg", "mix"):
            raise ValueError("den must be 'seg' or 'mix'")
        if den == "seg" and M <= 0:
            raise ValueError("whole-decode kernel needs segment size M")
        self.den, self.Ps, self.P0 = den, float(Ps), float(P0)
        # A/B experiment knobs (round-4/5 kernel ladders; defaults are
        # the measured winners — see scripts/profile_kernel_stages.py).
        self.fold_mode = os.environ.get("AMP_KERNEL_FOLD", "rollfirst")
        self.segred = os.environ.get("AMP_KERNEL_SEGRED", "roll")
        self.cmul = os.environ.get("AMP_KERNEL_CMUL", "gauss")
        xp = os.environ.get("AMP_KERNEL_XMAP_PRECISION", "")
        self.x_precision = xp if xp else None
        syms = [complex(s) for s in symbols]
        self.sym_re = tuple(np.float32(s.real) for s in syms)
        self.sym_im = tuple(np.float32(s.imag) for s in syms)
        # Real alphabets (OOK/BPSK) drop the x-side imaginary state from
        # the in-kernel loop carry (bit-identical — see _decode_kernel).
        self.real_x = (all(float(si) == 0.0 for si in self.sym_im)
                       and os.environ.get("AMP_KERNEL_REAL", "1") != "0")
        self.M = M
        self.interpret = interpret
        self.precision = precision
        K = len(syms)
        # 5 x-side blocked inputs + 5 aliased outputs, plus ~2K denoiser
        # temporaries resident across the in-kernel loop.
        tile = _pick_tile(batch, 10 + 2 * K, 9, op.Lin, op.Lout,
                          op.Nt, op.Nr)
        if tile == 0:
            raise NoVmemTileError(
                "no trial tile fits VMEM for this geometry")
        self._setup(op, tile)
        # Per-tap-constant gains fold into the tap planes host-side
        # (kills the 6 per-iteration gain multiplies; the Gauss combo
        # planes come precomputed too).  Column-dependent gains keep the
        # resident Gf/G2f plane path.
        self.gains_folded = (os.environ.get("AMP_KERNEL_GAINS", "1") != "0"
                             and self._gains_per_tap() is not None)
        self._tap_args = (self._fold_taps(self.cmul, real_x=self.real_x)
                          if self.gains_folded
                          else (self.S_re, self.S_im, self.S_a2,
                                self.S_re.T, self.S_im.T, self.S_a2.T,
                                self.Gf, self.G2f))

    def decode_call(self, sigma2, cap, act, T,
                    xmap_re, xmap_im, xm_re, xm_im, var,
                    z_re, z_im, u, y_re, y_im):
        """Run the full decode on block-major split planes.

        ``cap`` is the remaining-iteration budget (traced scalar — one
        compilation covers any cap at a given batch shape); ``act``/``T``
        are (B, 1) float32 per-trial active mask / iteration counts.
        Returns ``(xmap_re, xmap_im, xmmse_re, xmmse_im, var, z_re, z_im,
        u, act, T)``; the eight state planes alias their input buffers.
        """
        Lin, Lout, Lh, Nt, Nr, tile, trunc = self.geom
        B = act.shape[0]
        grid = (B // tile,)
        xspec = lambda: pl.BlockSpec((Lin, tile, Nt), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)
        yspec = lambda: pl.BlockSpec((Lout, tile, Nr), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)
        aspec = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        x_shape = jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32)
        y_shape = jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32)
        a_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
        kern = functools.partial(
            _decode_kernel, Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr,
            Bt=tile, trunc=trunc, M=self.M, sym_re=self.sym_re,
            sym_im=self.sym_im, precision=self.precision,
            den=self.den, Ps=self.Ps, P0=self.P0,
            x_precision=self.x_precision, fold_mode=self.fold_mode,
            segred=self.segred, cmul=self.cmul,
            gains_folded=self.gains_folded, real_x=self.real_x)
        # inputs: 0 sigma2, 1 cap, 2 act, 3 T, 4-8 x-planes, 9-11 z/u,
        # 12-13 y, 14-21 taps/gains; outputs: 0-4 x-planes, 5-7 z/u,
        # 8 act, 9 T
        aliases = {4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5, 10: 6, 11: 7,
                   2: 8, 3: 9}
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[smem(), smem(), aspec(), aspec()]
            + [xspec()] * 5 + [yspec()] * 5
            + [full()] * 8,
            out_specs=[xspec()] * 5 + [yspec()] * 3 + [aspec()] * 2,
            out_shape=[x_shape] * 5 + [y_shape] * 3 + [a_shape] * 2,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                # Full physical VMEM: a cap, not an allocation — the
                # massive Nt=1344 geometry at PALLAS_TILE=8 needs the
                # headroom (blocked operands + taps + temporaries ~70MB).
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=self.interpret,
        )(jnp.asarray(sigma2, jnp.float32).reshape(1),
          jnp.asarray(cap, jnp.int32).reshape(1), act, T,
          xmap_re, xmap_im, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
          *self._tap_args)


class FusedBandedIteration(_PlaneKernelBase):
    """Callable wrapping the fused kernels for a fixed banded operator.

    Built from an :class:`..operators.BandedOperator`; ``__call__`` maps
    (B, ·)-major complex jnp state to the kernel's block-major split
    planes, runs the kernel, and returns results in the decoder's layout.

    With ``fuse_denoiser=False`` (general alphabets) it returns
    ``(xmap, cov, z_new, u_new)`` — the linear part of the iteration, the
    denoiser runs outside.  With ``fuse_denoiser=True`` (complex
    single-symbol alphabets, M a power of two) it returns
    ``(xmap, xmmse, var, z_new, u_new)`` — the WHOLE iteration fused.
    """

    def __init__(self, op, batch: int, interpret: bool = False,
                 fuse_denoiser: bool = False, symbols=None, M: int = 0):
        self.interpret = interpret
        self.fuse_denoiser = fuse_denoiser
        if fuse_denoiser:
            if symbols is None or len(symbols) != 1:
                raise ValueError("fused denoiser supports K=1 alphabets")
            if M <= 0 or (M & (M - 1)):
                raise ValueError("fused denoiser needs M a power of two")
            s0 = complex(symbols[0])
            self.denoise_args = (M, np.float32(s0.real), np.float32(s0.imag))
        else:
            self.denoise_args = None
        n_x = 8 if fuse_denoiser else 6
        tile = _pick_tile(batch, n_x, 9, op.Lin, op.Lout, op.Nt, op.Nr)
        if tile == 0:
            raise NoVmemTileError(
                "no trial tile fits VMEM for this geometry")
        self._setup(op, tile)

    def plane_call(self, sigma2, xm_re, xm_im, var, z_re, z_im, u,
                   y_re, y_im, act=None):
        """Run the kernel directly on block-major split planes —
        ``(Lin, B, Nt)`` x-side / ``(Lout, B, Nr)`` y-side float32 — so a
        decode loop can keep its state in kernel layout across iterations
        (the (B, N) <-> plane transposes cost more than the kernel when
        done every iteration).

        With the fused denoiser, ``act`` is the (B, 1) f32 active mask:
        frozen trials pass through in-kernel (their six carried planes
        reuse the input buffers via aliasing), and the extra ``notok``
        output counts variance entries outside the allclose tolerance per
        (channel-use block, trial)."""
        sig = jnp.asarray(sigma2, jnp.float32).reshape(1)
        return _call(sig, xm_re, xm_im, var, z_re, z_im, u, y_re, y_im,
                     self.S_re, self.S_im, self.S_a2, self.Gf, self.G2f,
                     self.geom, self.interpret,
                     denoise_args=self.denoise_args, act=act)

    def __call__(self, xmmse, var, z, u, y, sigma2):
        sig = jnp.asarray(sigma2, jnp.float32).reshape(1)
        out = _call(sig,
                    self._to_x(jnp.real(xmmse)), self._to_x(jnp.imag(xmmse)),
                    self._to_x(var),
                    self._to_y(jnp.real(z)), self._to_y(jnp.imag(z)),
                    self._to_y(u),
                    self._to_y(jnp.real(y)), self._to_y(jnp.imag(y)),
                    self.S_re, self.S_im, self.S_a2, self.Gf, self.G2f,
                    self.geom, self.interpret,
                    denoise_args=self.denoise_args)
        if self.denoise_args is None:
            xmap_re, xmap_im, cov, zr, zi, un = out
            return (jax.lax.complex(self._from_x(xmap_re),
                                    self._from_x(xmap_im)),
                    self._from_x(cov),
                    jax.lax.complex(self._from_y(zr), self._from_y(zi)),
                    self._from_y(un))
        xmap_re, xmap_im, xn_re, xn_im, varn, zr, zi, un, _ = out
        return (jax.lax.complex(self._from_x(xmap_re),
                                self._from_x(xmap_im)),
                jax.lax.complex(self._from_x(xn_re), self._from_x(xn_im)),
                self._from_x(varn),
                jax.lax.complex(self._from_y(zr), self._from_y(zi)),
                self._from_y(un))
