"""Stage-by-stage cycle budget of the whole-decode BAMP Pallas kernel.

VERDICT r3 item 1: 9.3% MFU with VMEM-resident state means the missing
time is INSIDE the kernel.  This measures fixed-trip-count variants of the
kernel body at the flagship geometry (no early exit, no convergence
dependence — every variant runs exactly NIT iterations), isolating:

  linear      the 10 main banded matmuls + band shift/gather + Onsager
  +denoiser   ... plus the K=1 segmented softmax
  full        ... plus the allclose bad-count + per-trial freeze selects

and A/Bs the round-4 ladder knobs on the full body:

  fold=matmul|roll     tap lane-group fold (3 padded matmuls vs VPU rolls)
  segred=matmul|roll   denoiser segment reduce (4 padded matmuls vs rolls)
  xmap=highest|high    Pr/Pi/adjoint matmul precision (6-pass vs 3-pass)

Usage: timeout 1200 python scripts/profile_kernel_stages.py [B] [NIT]
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amp_sparc_spatialmodulation_tpu.config import flagship_bamp_ook
from amp_sparc_spatialmodulation_tpu.ops import operators
from amp_sparc_spatialmodulation_tpu.ops.pallas import fused_bamp as fb
from amp_sparc_spatialmodulation_tpu.utils.cache import (
    enable_persistent_cache)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_timer(fd, B, NIT, *, stage="full", fold_mode="roll",
               segred="roll", x_precision=None, cmul="gauss",
               gains_folded=False, real_x=False):
    Lin, Lout, Lh, Nt, Nr, tile, trunc = fd.geom
    geom = dict(Lin=Lin, Lout=Lout, Lh=Lh, Nt=Nt, Nr=Nr, Bt=tile,
                trunc=trunc, precision=fd.precision,
                x_precision=x_precision, fold_mode=fold_mode, cmul=cmul,
                gains_folded=gains_folded)
    M = fd.M
    s0_re, s0_im = fd.sym_re[0], fd.sym_im[0]

    def kern(sigma2_ref, xm_re_ref, xm_im_ref, var_ref, z_re_ref, z_im_ref,
             u_ref, y_re_ref, y_im_ref, S_re_ref, S_im_ref, S_a2_ref,
             St_re_ref, St_im_ref, St_a2_ref, Gf_ref, G2f_ref,
             xn_re_o, xn_im_o, varn_o, zn_re_o, zn_im_o, un_o, nk_o):
        sigma2 = sigma2_ref[0]
        x2 = lambda r, n: r[:].reshape(-1, n)
        y_re, y_im = x2(y_re_ref, Nr), x2(y_im_ref, Nr)
        taps = (S_re_ref[:], S_im_ref[:], S_a2_ref[:], St_re_ref[:],
                St_im_ref[:], St_a2_ref[:], Gf_ref[:], G2f_ref[:])
        init = (x2(xm_re_ref, Nt), x2(xm_im_ref, Nt), x2(var_ref, Nt),
                x2(z_re_ref, Nr), x2(z_im_ref, Nr), x2(u_ref, Nr),
                jnp.zeros((tile, 1), jnp.float32))

        def body(_, c):
            xm_re, xm_im, var, z_re, z_im, u, nk = c
            if stage == "mm":
                # MXU floor: the realx+gauss iteration's 7 matmuls at
                # production shapes/precision, minimal glue — how much
                # of 'linear' is matmul time vs exposed VPU work.
                dot = fb.make_dot(fd.precision)
                S_re, S_im, S_a2, St_re, St_im, St_a2 = taps[:6]
                f1 = dot(xm_re, S_re)           # (320, 72)
                f2 = dot(xm_re, S_im)
                f3 = dot(var, S_a2)
                b0 = dot(f3, St_a2)             # (320, 128)
                b1 = dot(f1, St_re)
                b2 = dot(f2, St_im)
                b3 = dot(f1 + f2, St_re)
                return (0.1 * b1 + 0.01 * b3, xm_im,
                        jnp.minimum(jnp.abs(b0) + 0.1 * jnp.abs(b2), 2.0),
                        z_re, z_im, u, nk)
            if stage == "mm6":
                # Manual 6-pass HIGHEST with HOST-PRESPLIT bf16 RHS
                # triples ([hi; mid; lo] stacked on sublanes): if the
                # native HIGHEST lowering re-splits both operands into
                # bf16 planes on the VPU at every call, removing the
                # (loop-invariant) RHS splits should show up here.
                def dot6(x, a3):
                    K = x.shape[1]
                    x1 = x.astype(jnp.bfloat16)
                    r1 = x - x1.astype(jnp.float32)
                    x2 = r1.astype(jnp.bfloat16)
                    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
                    a1, a2, a3_ = a3[:K], a3[K:2 * K], a3[2 * K:]
                    d = lambda p, q: jnp.dot(
                        p, q, preferred_element_type=jnp.float32)
                    return (d(x1, a1) + (d(x1, a2) + d(x2, a1))
                            + (d(x1, a3_) + d(x3, a1) + d(x2, a2)))

                S_re, S_im, S_a2, St_re, St_im, St_a2 = taps[:6]
                f1 = dot6(xm_re, S_re)
                f2 = dot6(xm_re, S_im)
                f3 = dot6(var, S_a2)
                b0 = dot6(f3, St_a2)
                b1 = dot6(f1, St_re)
                b2 = dot6(f2, St_im)
                b3 = dot6(f1 + f2, St_re)
                return (0.1 * b1 + 0.01 * b3, xm_im,
                        jnp.minimum(jnp.abs(b0) + 0.1 * jnp.abs(b2), 2.0),
                        z_re, z_im, u, nk)
            if stage == "den":
                dn_re, dn_im, varn = fb._k1_denoiser(
                    xm_re, xm_im, var + 1.0, Nt=Nt, M=M, s0_re=s0_re,
                    s0_im=s0_im, segred=segred)
                # keep magnitudes bounded so the loop can't overflow
                return (0.5 * xm_re + dn_re, 0.5 * xm_im + dn_im,
                        0.5 * var + varn, z_re, z_im, u, nk)
            xr, xi, cov, zn_re, zn_im, un = fb._linear_iteration(
                sigma2, xm_re, None if real_x else xm_im, var,
                z_re, z_im, u, y_re, y_im, *taps, **geom)
            if stage == "linear":
                return (0.1 * xr, 0.1 * xi, jnp.minimum(cov, 1.0),
                        0.5 * zn_re, 0.5 * zn_im, jnp.minimum(un, 4.0), nk)
            if real_x:
                dn_re, _, varn = fb._seg_denoiser(
                    xr, None, cov, Nt=Nt, M=M, sym_re=fd.sym_re,
                    sym_im=fd.sym_im, segred=segred)
                dn_im = xm_im   # pass-through: loop-invariant, hoisted —
                # emulates the production carry that drops xm_im entirely
            else:
                dn_re, dn_im, varn = fb._k1_denoiser(
                    xr, xi, cov, Nt=Nt, M=M, s0_re=s0_re, s0_im=s0_im,
                    segred=segred)
            if stage == "noconv":
                return dn_re, dn_im, varn, zn_re, zn_im, un, nk
            # full: allclose bad-count + per-trial freeze selects with an
            # all-ones active mask (same op mix as production, fixed trips)
            bad = (jnp.abs(varn - var)
                   > 1e-8 + 1e-5 * jnp.abs(var)).astype(jnp.float32)
            nb = bad.sum(axis=1, keepdims=True)
            notok = nb[:tile]
            for l in range(1, Lin):
                notok = notok + nb[l * tile:(l + 1) * tile]
            act = jnp.ones((tile, 1), jnp.float32)
            mx = jnp.concatenate([act] * Lin, axis=0)
            my = jnp.concatenate([act] * Lout, axis=0)
            sel = lambda m, new, old: jnp.where(m > 0.0, new, old)
            return (sel(mx, dn_re, xm_re), sel(mx, dn_im, xm_im),
                    sel(mx, varn, var), sel(my, zn_re, z_re),
                    sel(my, zn_im, z_im), sel(my, un, u), nk + notok)

        out = jax.lax.fori_loop(0, NIT, body, init)
        xm_re, xm_im, var, z_re, z_im, u, nk = out
        xn_re_o[:] = xm_re.reshape(Lin, tile, Nt)
        xn_im_o[:] = xm_im.reshape(Lin, tile, Nt)
        varn_o[:] = var.reshape(Lin, tile, Nt)
        zn_re_o[:] = z_re.reshape(Lout, tile, Nr)
        zn_im_o[:] = z_im.reshape(Lout, tile, Nr)
        un_o[:] = u.reshape(Lout, tile, Nr)
        nk_o[:] = nk

    grid = (B // tile,)
    xspec = lambda: pl.BlockSpec((Lin, tile, Nt), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    yspec = lambda: pl.BlockSpec((Lout, tile, Nr), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    aspec = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x_shape = jax.ShapeDtypeStruct((Lin, B, Nt), jnp.float32)
    y_shape = jax.ShapeDtypeStruct((Lout, B, Nr), jnp.float32)

    taps_args = (fd.profiler_taps_presplit if stage == "mm6"
                 else fd.profiler_taps_folded if gains_folded
                 else fd.profiler_taps)

    def run(sigma2, planes, taps):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [xspec()] * 3 + [yspec()] * 5 + [full()] * 8,
            out_specs=[xspec()] * 3 + [yspec()] * 3 + [aspec()],
            out_shape=[x_shape] * 3 + [y_shape] * 3
            + [jax.ShapeDtypeStruct((B, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(sigma2, *planes, *taps)

    jitted = jax.jit(run)
    return lambda sigma2, planes: jitted(sigma2, planes, taps_args)


def main():
    enable_persistent_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    NIT = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = flagship_bamp_ook()
    key = jax.random.PRNGKey(0)

    # The kernel object and its tap planes must be built INSIDE a jit
    # trace: the eager complex64 ops in banded_sparc are UNIMPLEMENTED on
    # the remote-TPU axon backend, and one poisoned eager dispatch makes
    # every later fetch in the process fail (production never sees this —
    # there the operator is traced per realization).  Static metadata is
    # smuggled out through a holder.
    holder = {}

    @jax.jit
    def mk_taps(k):
        _, op2 = operators.banded_sparc(k, cfg)
        f2 = fb.FusedBandedDecode(op2, B, symbols=cfg.symbols, M=cfg.M)
        holder["fd"] = f2
        folded = f2._fold_taps("gauss")

        def presplit(a):
            a = jnp.asarray(a, jnp.float32)
            a1 = a.astype(jnp.bfloat16)
            r = a - a1.astype(jnp.float32)
            a2 = r.astype(jnp.bfloat16)
            a3 = (r - a2.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.concatenate([a1, a2, a3], axis=0)

        pre = tuple(presplit(t) for t in folded[:6]) + folded[6:]
        return ((f2.S_re, f2.S_im, f2.S_a2, f2.S_re.T, f2.S_im.T,
                 f2.S_a2.T, f2.Gf, f2.G2f), folded, pre)

    taps, taps_folded, taps_pre = mk_taps(key)
    fd = holder["fd"]
    fd.profiler_taps = taps
    fd.profiler_taps_folded = taps_folded
    fd.profiler_taps_presplit = taps_pre
    Lin, Lout, Lh, Nt, Nr, tile, trunc = fd.geom
    log(f"platform={jax.default_backend()} B={B} NIT={NIT} tile={tile}")

    # Inputs are built INSIDE jit: several eager op paths (complex64
    # arithmetic, some rng shapes) are UNIMPLEMENTED on the remote-TPU
    # axon backend and poison every downstream fetch.
    @jax.jit
    def mk_planes(key):
        k1, _ = jax.random.split(key)
        mk_x = lambda k: jax.random.normal(k, (Lin, B, Nt)) * 0.1
        mk_y = lambda k: jax.random.normal(k, (Lout, B, Nr)) * 0.1
        ks = jax.random.split(k1, 8)
        return (mk_x(ks[0]), mk_x(ks[1]), jnp.abs(mk_x(ks[2])) + 0.5,
                mk_y(ks[3]), mk_y(ks[4]), jnp.abs(mk_y(ks[5])) + 0.5,
                mk_y(ks[6]), mk_y(ks[7]))

    planes = mk_planes(key)
    sigma2 = jnp.asarray([0.05], jnp.float32)

    variants = [
        ("linear/roll", dict(stage="linear")),
        ("full/roll+roll", dict(stage="full")),
        # --- round-5 levers, isolated then stacked -------------------
        ("linear/rollfirst", dict(stage="linear", fold_mode="rollfirst")),
        ("linear/roll+folded", dict(stage="linear", gains_folded=True)),
        ("linear/roll+realx", dict(stage="linear", real_x=True)),
        ("linear/rf+folded+realx", dict(stage="linear",
                                        fold_mode="rollfirst",
                                        gains_folded=True, real_x=True)),
        ("noconv/rf+folded+realx", dict(stage="noconv",
                                        fold_mode="rollfirst",
                                        gains_folded=True, real_x=True)),
        ("full/rf+folded+realx", dict(stage="full",
                                      fold_mode="rollfirst",
                                      gains_folded=True, real_x=True)),
        ("den/roll", dict(stage="den")),
        ("noconv/roll", dict(stage="noconv")),
        ("mm/7matmuls", dict(stage="mm", gains_folded=True)),
        ("mm6/presplit", dict(stage="mm6", gains_folded=True)),
    ]
    only = [s for s in os.environ.get("PROF_ONLY", "").split(",") if s]
    if only:
        variants = [(n, kw) for n, kw in variants
                    if any(o in n for o in only)]
    useful_flop = 3.69e6  # per iter per trial (bench.py roofline)
    results = {}
    # On the remote-TPU tunnel, block_until_ready does not actually wait;
    # only a host fetch of a value does (same reason bench.py times around
    # fetch_sums).  Reduce one output to a scalar and .item() it.
    for name, kw in variants:
        timer = make_timer(fd, B, NIT, **kw)
        fetch = jax.jit(
            lambda o: jnp.stack([jnp.sum(p) for p in o]))
        np.asarray(fetch(timer(sigma2, planes)))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fetch(timer(sigma2, planes)))
            best = min(best, time.perf_counter() - t0)
        ns_it = best / NIT / B * 1e9
        tfs = useful_flop * NIT * B / best / 1e12
        results[name] = (best, ns_it, tfs)
        log(f"{name:32s} {best*1e3:8.2f} ms  {ns_it:7.1f} ns/iter/trial  "
            f"useful {tfs:5.2f} TFLOP/s")
    # derived splits
    if "full/roll+roll" in results and "noconv/roll" in results:
        conv = results["full/roll+roll"][1] - results["noconv/roll"][1]
        den = results["noconv/roll"][1] - results["linear/roll"][1]
        log(f"\nderived: conv-test+freeze {conv:.1f} ns/it/trial, "
            f"denoiser {den:.1f}, linear {results['linear/roll'][1]:.1f}")


if __name__ == "__main__":
    main()
