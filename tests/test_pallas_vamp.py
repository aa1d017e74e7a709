"""Fused whole-decode VAMP kernel vs the XLA SV-domain path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import vamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message


def _setup(B=8, seed=0, snr_exp=1.5, alphabet="OOK", iterations=10):
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet=alphabet, profile="uniform", trunc="tail",
                 iterations=iterations)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** snr_exp
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    return cfg, vamp.svd(A), y, cfg.sigma2(snr)


@pytest.mark.parametrize("alphabet,snr_exp", [("OOK", 1.5), ("QPSK", 1.9)])
def test_fused_vamp_matches_xla(alphabet, snr_exp):
    cfg, dec, y, s2 = _setup(alphabet=alphabet, snr_exp=snr_exp)
    r_x = vamp.decode(dec, y, s2, cfg)
    r_p = vamp.decode(dec, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    # the extrinsic r (= xmap) divides by (1 - alpha) with alpha clipped at
    # 1-1e-5 — an up-to-1e5 amplifier of f32 accumulation-order noise
    # (`vamp.py:75-82`); the bounded posterior outputs stay tight.
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 5e-2
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-3
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-3


def test_fused_vamp_lane_chunking_matches_whole_plane(monkeypatch):
    """The chunked in-kernel denoiser (the flagship-geometry VMEM fix —
    (chunk, chunk/M) indicator mats instead of (N, N/M)) is trajectory-
    identical to the whole-plane kernel."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas import fused_vamp
    cfg, dec, y, s2 = _setup()
    N = dec.Vh.shape[1]
    whole = vamp.decode(dec, y, s2, cfg, use_pallas=True)
    monkeypatch.setattr(fused_vamp, "_pick_chunk", lambda n, m: N // 4)
    chunked = vamp.decode(dec, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(whole.T),
                                  np.asarray(chunked.T))
    assert float(jnp.max(jnp.abs(whole.xmmse - chunked.xmmse))) < 1e-5


def test_fused_vamp_high_precision_close():
    """precision=HIGH maps to the manual 3-pass bf16 dot in-kernel
    (Mosaic rejects lax.Precision.HIGH natively); the trajectory stays
    statistically indistinguishable from HIGHEST."""
    cfg, dec, y, s2 = _setup()
    hi = vamp.decode(dec, y, s2, cfg, use_pallas=True)
    h3 = vamp.decode(dec, y, s2, cfg, use_pallas=True,
                     precision=jax.lax.Precision.HIGH)
    # bounded posterior outputs agree to bf16x3 accumulation error
    assert float(jnp.max(jnp.abs(hi.xmmse - h3.xmmse))) < 5e-2
    assert float(jnp.mean(jnp.abs(hi.xmmse - h3.xmmse))) < 5e-3
    assert abs(float(hi.T.mean()) - float(h3.T.mean())) <= 2.0


def test_fused_vamp_resumable():
    cfg, dec, y, s2 = _setup(iterations=8)
    full = vamp.decode(dec, y, s2, cfg, use_pallas=True)
    _, st = vamp.decode(dec, y, s2, cfg, use_pallas=True, iter_cap=3,
                        return_state=True)
    resumed = vamp.decode(dec, y, s2, cfg, use_pallas=True, state0=st)
    np.testing.assert_array_equal(np.asarray(full.T), np.asarray(resumed.T))
    assert float(jnp.max(jnp.abs(full.xmmse - resumed.xmmse))) < 1e-5


def test_vamp_simulator_with_pallas(tmp_path):
    """Simulator(algo='vamp', use_pallas=True) runs end-to-end and matches
    the fused single-phase statistics under two-phase."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=20)
    s1 = Simulator(cfg, algo="vamp", out_root=str(tmp_path / "a"),
                   use_pallas=True)
    s2 = Simulator(cfg, algo="vamp", out_root=str(tmp_path / "b"),
                   two_phase=4, use_pallas=True)
    a1 = s1.run_point(9.0, epochs=64, res=32)
    a2 = s2.run_point(9.0, epochs=64, res=32)
    for k, v in a1.items():
        assert a2[k] == pytest.approx(v, rel=1e-4, abs=1e-6), k


def test_vamp_decode_batched_matches_unrolled():
    """The realization-batched kernel (one grid over C realizations'
    trial tiles, per-realization tap blocks) must reproduce C separate
    use_pallas decodes exactly — the kernel body is unchanged, only
    which tap block each program reads differs."""
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=10)
    B, C = 8, 3
    key = jax.random.PRNGKey(7)
    snr = 10 ** 1.5
    s2 = cfg.sigma2(snr)
    As, ys = [], []
    for c in range(C):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, c), 3)
        _, A = channel.generate_as_sparc(k1, cfg)
        msg = message.generate_message(k2, cfg, B)
        ys.append(msg.x @ A.T + channel.awgn(k3, cfg, snr, B))
        As.append(A)
    A_b = jnp.stack(As)
    y_b = jnp.stack(ys)
    out = vamp.decode_batched(A_b, y_b, s2, cfg, svd_method="direct")
    for c in range(C):
        ref = vamp.decode(vamp.svd(As[c], method="direct"), ys[c], s2,
                          cfg, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(out.T[c]),
                                      np.asarray(ref.T))
        assert float(jnp.max(jnp.abs(out.xmmse[c] - ref.xmmse))) < 1e-5
        assert float(jnp.max(jnp.abs(out.var[c] - ref.var))) < 1e-5


def test_vamp_simulator_batched_matches_single(tmp_path):
    """chans_per_batch>1 with use_pallas now composes for VAMP: the
    batched-step simulator must reproduce the unrolled one's metrics
    up to f32 re-association."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=10)
    a = Simulator(cfg, algo="vamp", out_root=str(tmp_path / "a"),
                  use_pallas=True).run_point(6.0, epochs=96, res=32)
    b = Simulator(cfg, algo="vamp", out_root=str(tmp_path / "b"),
                  use_pallas=True, chans_per_batch=3
                  ).run_point(6.0, epochs=96, res=32)
    for k, v in a.items():
        assert b[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k
