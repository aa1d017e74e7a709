"""Fused Pallas BAMP iteration vs the XLA banded path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators


def _setup(trunc="tail", B=8, seed=0, snr_exp=1.5, alphabet="QPSK",
           iterations=8):
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="segmented",
                 alphabet=alphabet, profile="uniform", trunc=trunc,
                 iterations=iterations)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** snr_exp
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, B)
    return cfg, op, y, cfg.sigma2(snr)


@pytest.mark.parametrize("trunc", ["tail", "trunc", "cyclic"])
def test_fused_matches_xla(trunc):
    cfg, op, y, s2 = _setup(trunc=trunc)
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


@pytest.mark.parametrize("trunc", ["tail", "trunc", "cyclic"])
def test_fully_fused_ook_matches_xla(trunc):
    """OOK (K=1) activates the whole-iteration kernel with the in-kernel
    segmented denoiser; the trajectory must match the XLA path."""
    cfg, op, y, s2 = _setup(trunc=trunc, alphabet="OOK", snr_exp=1.2,
                            iterations=12)
    assert cfg.K == 1
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


def test_fused_denoiser_flag_selected():
    """The fused-denoiser kernel engages exactly for K=1 power-of-two M."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        FusedBandedIteration)
    cfg, op, y, s2 = _setup(alphabet="OOK")
    f = FusedBandedIteration(op, 8, interpret=True, fuse_denoiser=True,
                             symbols=cfg.symbols, M=cfg.M)
    assert f.fuse_denoiser
    with pytest.raises(ValueError):
        FusedBandedIteration(op, 8, interpret=True, fuse_denoiser=True,
                             symbols=[1.0, -1.0], M=cfg.M)
    with pytest.raises(ValueError):
        FusedBandedIteration(op, 8, interpret=True, fuse_denoiser=True,
                             symbols=cfg.symbols, M=3)


def test_fused_requires_banded():
    cfg, op, y, s2 = _setup()
    with pytest.raises(ValueError):
        bamp.decode(op.densify(), y, s2, cfg, use_pallas=True)


def test_whole_decode_8psk_matches_xla():
    """K=8 alphabets run through the whole-decode kernel's general
    segmented denoiser."""
    cfg, op, y, s2 = _setup(alphabet="8PSK", snr_exp=1.6, iterations=10)
    assert cfg.K == 8
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


def test_whole_decode_non_pow2_segment():
    """The doubling suffix-max is exact for ANY segment size M (boundary
    masks), not just powers of two."""
    cfg = Config(Nt=24, Na=4, Nr=8, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=10)
    assert cfg.M == 6
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, 8)
    snr = 10 ** 1.3
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, 8)
    s2 = cfg.sigma2(snr)
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4


def test_whole_decode_random_mode_matches_xla():
    """Random-mode BAMP (i.i.d. Bernoulli-mixture denoiser,
    `bamp.py:79-97`) runs through the whole-decode kernel's lane-local
    mixture posterior; trajectory must match the XLA path."""
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="random",
                 alphabet="QPSK", profile="uniform", trunc="tail",
                 iterations=10)
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    op = operators.banded_toeplitz(k1, cfg)
    msg = message.generate_message(k2, cfg, 8)
    snr = 10 ** 1.4
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, 8)
    s2 = cfg.sigma2(snr)
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


def test_whole_decode_resumable():
    """Splitting a fused decode at any cap and resuming yields the same
    trajectory (the contract two-phase continuation batching relies on)."""
    cfg, op, y, s2 = _setup(alphabet="OOK", snr_exp=1.2, iterations=12)
    full = bamp.decode(op, y, s2, cfg, use_pallas=True)
    _, st = bamp.decode(op, y, s2, cfg, use_pallas=True, iter_cap=3,
                        return_state=True)
    resumed = bamp.decode(op, y, s2, cfg, use_pallas=True, state0=st)
    np.testing.assert_array_equal(np.asarray(full.T), np.asarray(resumed.T))
    assert float(jnp.max(jnp.abs(full.xmmse - resumed.xmmse))) < 1e-5
    assert float(jnp.max(jnp.abs(full.var - resumed.var))) < 1e-5


def test_use_pallas_honored_single_phase(tmp_path):
    """Simulator(use_pallas=True, two_phase=None) must run the fused kernel
    (interpret mode on CPU) — not silently fall back to XLA — and produce
    the same statistics."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=20)
    s_x = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "x"),
                    use_pallas=False)
    s_p = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "p"),
                    use_pallas=True)
    a_x = s_x.run_point(8.0, epochs=64, res=32)
    a_p = s_p.run_point(8.0, epochs=64, res=32)
    for k, v in a_x.items():
        if k in ("T", "nMSE"):
            # borderline 1e-5-allclose stops can flip by one iteration
            # under the kernel's different f32 accumulation order (same
            # class as dense-vs-banded XLA; see BASELINE.md) — allow up
            # to two single-iteration flips across the 64-trial batch
            assert a_p[k] == pytest.approx(v, rel=5e-2, abs=2.5 / 64), k
        else:
            assert a_p[k] == pytest.approx(v, rel=1e-4, abs=1e-6), k


def test_dot3_error_bound():
    """The manual 3-pass bf16 dot (`fused_bamp.dot3` — the in-kernel
    stand-in for lax.Precision.HIGH, which Mosaic rejects) reconstructs
    an f32 matmul to the hi+lo representation error (~2^-16), far beyond
    1-pass bf16."""
    import jax

    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import dot3
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (64, 256), jnp.float32)
    a = jax.random.normal(k2, (256, 128), jnp.float32)
    exact = jnp.dot(x, a, precision=jax.lax.Precision.HIGHEST)
    approx = dot3(x, a)
    one_pass = jnp.dot(x.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    scale = float(jnp.max(jnp.abs(exact)))
    err3 = float(jnp.max(jnp.abs(approx - exact))) / scale
    err1 = float(jnp.max(jnp.abs(one_pass - exact))) / scale
    assert err3 < 2e-4          # ~16-bit mantissa over a K=256 sum
    assert err3 < err1 / 10     # and an order better than 1-pass bf16


def test_use_pallas_never_silently_ignored():
    """Explicit use_pallas=True raises wherever the kernel cannot apply."""
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=20)
    with pytest.raises(ValueError):
        montecarlo.make_realization_fn(cfg, "bamp", "sparc", 8,
                                       operator_form="dense",
                                       use_pallas=True)
    # 'auto' resolves off-TPU to False without raising
    fn = montecarlo.make_realization_fn(cfg, "bamp", "sparc", 8,
                                        operator_form="banded")
    assert fn.use_pallas is False


def test_pallas_tile_override_validation(monkeypatch):
    """PALLAS_TILE bypasses the VMEM budget (the experiment knob) but never
    the hard layout constraints, and it must announce itself."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        _pick_tile)
    monkeypatch.setenv("PALLAS_TILE", "12")   # not a multiple of 8
    with pytest.raises(ValueError):
        _pick_tile(96, 6, 9, 20, 22, 128, 24)
    monkeypatch.setenv("PALLAS_TILE", "64")   # doesn't divide B
    with pytest.raises(ValueError):
        _pick_tile(96, 6, 9, 20, 22, 128, 24)
    monkeypatch.setenv("PALLAS_TILE", "16")
    with pytest.warns(UserWarning):
        assert _pick_tile(96, 6, 9, 20, 22, 128, 24) == 16


def test_tile_picker():
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        _pick_tile)
    # flagship geometry: tile 32 is the largest that fits once Mosaic's
    # 128-lane padding of the Nr=24 y-side planes is accounted for (tile 64
    # was measured to OOM scoped VMEM on a real v5e: 18.5M vs the 14M cap)
    assert _pick_tile(2048, 6, 9, 20, 22, 128, 24) == 32
    # massive geometry: the x-side working set alone exceeds VMEM — the
    # lane-major kernel doesn't apply (banded XLA path covers it)
    assert _pick_tile(128, 6, 9, 32, 37, 1344, 73) == 0


def test_explicit_use_pallas_uncovered_config_raises():
    """Explicit use_pallas=True with a config the kernel cannot decode is
    an error everywhere — never a silent XLA fallback (round-3 contract)."""
    from amp_sparc_spatialmodulation_tpu.models import montecarlo, vamp

    cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="random",
                 alphabet="QPSK", profile="uniform", trunc="tail",
                 iterations=6)
    # vamp's kernel has no random-mode denoiser: resolver must raise...
    with pytest.raises(ValueError, match="does not cover"):
        montecarlo.resolve_use_pallas(True, cfg, "vamp", "dense")
    with pytest.raises(ValueError, match="does not cover"):
        montecarlo.make_realization_fn(cfg, "vamp", "iid", 8,
                                       use_pallas=True)
    # ...and so must a direct decoder call.
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    from amp_sparc_spatialmodulation_tpu.ops import channel as chan_ops
    from amp_sparc_spatialmodulation_tpu.ops import message as msg_ops
    A = chan_ops.generate_as_random(k1, cfg)
    msg = msg_ops.generate_message(k2, cfg, 4)
    y = msg.x @ A.T + chan_ops.awgn(k3, cfg, 10.0, 4)
    with pytest.raises(ValueError, match="use_pallas"):
        vamp.decode(vamp.svd(A), y, cfg.sigma2(10.0), cfg,
                    use_pallas=True)
    # 'auto' quietly resolves to the XLA path for the same config.
    assert montecarlo.resolve_use_pallas("auto", cfg, "vamp",
                                         "dense") is False


def test_periter_mode_k_gt_1_runs_xla(monkeypatch):
    """AMP_PALLAS_MODE=periter on a K>1 alphabet measures the XLA path
    (the linear-only per-iteration kernel was 0.89x and is never used)."""
    monkeypatch.setenv("AMP_PALLAS_MODE", "periter")
    cfg, op, y, s2 = _setup(alphabet="QPSK")
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    monkeypatch.delenv("AMP_PALLAS_MODE")
    r_x = bamp.decode(op, y, s2, cfg)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    np.testing.assert_array_equal(np.asarray(r_x.xmap),
                                  np.asarray(r_p.xmap))


def test_make_dot_accepts_precision_strings():
    """jnp.dot accepts 'high'/'highest' strings, so make_dot must map the
    string form to the same kernels as the enum form."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        dot3, make_dot)
    assert make_dot("high") is dot3
    assert make_dot(jax.lax.Precision.HIGH) is dot3
    f = make_dot("highest")
    x = jnp.ones((8, 8), jnp.float32)
    np.testing.assert_allclose(np.asarray(f(x, x)), 8.0)


def test_fits_matches_constructor():
    """The classmethod VMEM-fit check and the constructor must agree (the
    'auto' resolver uses the former, decode the latter)."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        FusedBandedDecode)
    cfg, op, y, s2 = _setup(alphabet="QPSK")
    assert FusedBandedDecode.covers(cfg)
    assert FusedBandedDecode.fits(cfg, 8)
    FusedBandedDecode(op, 8, interpret=True, symbols=cfg.symbols, M=cfg.M)


def test_covers_matches_decode_guard():
    """bamp.decode's inline seg_ok/mix_ok coverage predicate must equal
    FusedBandedDecode.covers on every (mode, alphabet) combination (the
    decode guard used to assert this inline; pinned here instead)."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        FusedBandedDecode)
    for mode in ("segmented", "random"):
        for alphabet in ("OOK", "BPSK", "4ASK", "QPSK", "8PSK", "16QAM"):
            cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode=mode,
                         alphabet=alphabet, profile="uniform", trunc="tail")
            seg_ok = (cfg.mode in ("segmented", "sparc") and cfg.is_complex
                      and cfg.M > 0)
            mix_ok = cfg.mode == "random" and cfg.is_complex
            assert (seg_ok or mix_ok) == FusedBandedDecode.covers(cfg), (
                mode, alphabet)


def test_resolve_use_pallas_vamp2():
    """vamp2 gained a fused whole-decode kernel in round 4: explicit True
    resolves for covered configs, and the never-silent contract still
    raises where the kernel cannot decode (random generator mode)."""
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="segmented",
                 alphabet="QPSK", profile="uniform", trunc="tail")
    assert montecarlo.resolve_use_pallas(True, cfg, "vamp2", "dense")
    cfg_rand = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="random",
                      alphabet="QPSK", profile="uniform", trunc="tail")
    with pytest.raises(ValueError, match="does not cover"):
        montecarlo.resolve_use_pallas(True, cfg_rand, "vamp2", "dense")
