"""Fused whole-decode SCAMP kernel vs the XLA banded path (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import scamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators


def _setup(trunc="tail", B=8, seed=0, snr_exp=1.5, alphabet="OOK",
           iterations=10, Nt=16, Na=4, Nr=8, Lin=8, Lh=3):
    cfg = Config(Nt=Nt, Na=Na, Nr=Nr, Lin=Lin, Lh=Lh, mode="sparc",
                 alphabet=alphabet, profile="uniform", trunc=trunc,
                 iterations=iterations)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** snr_exp
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, B)
    return cfg, W, op, y, cfg.sigma2(snr)


@pytest.mark.parametrize("trunc", ["tail", "trunc", "cyclic"])
def test_fused_scamp_matches_xla(trunc):
    cfg, W, op, y, s2 = _setup(trunc=trunc)
    r_x = scamp.decode(W, op, y, s2, cfg)
    r_p = scamp.decode(W, op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


def test_fused_scamp_qpsk_matches_xla():
    cfg, W, op, y, s2 = _setup(alphabet="QPSK", snr_exp=1.8)
    assert cfg.K == 4
    r_x = scamp.decode(W, op, y, s2, cfg)
    r_p = scamp.decode(W, op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4


def test_fused_scamp_estimate_phi():
    """The estSCAMP empirical residual variance (`sparc.py:199`) inside
    the kernel."""
    cfg, W, op, y, s2 = _setup()
    r_x = scamp.decode(W, op, y, s2, cfg, estimate_phi=True)
    r_p = scamp.decode(W, op, y, s2, cfg, estimate_phi=True,
                       use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4


def test_fused_scamp_resumable():
    cfg, W, op, y, s2 = _setup(snr_exp=1.2, iterations=12)
    full = scamp.decode(W, op, y, s2, cfg, use_pallas=True)
    _, st = scamp.decode(W, op, y, s2, cfg, use_pallas=True, iter_cap=3,
                         return_state=True)
    resumed = scamp.decode(W, op, y, s2, cfg, use_pallas=True, state0=st)
    np.testing.assert_array_equal(np.asarray(full.T), np.asarray(resumed.T))
    assert float(jnp.max(jnp.abs(full.xmmse - resumed.xmmse))) < 1e-5


def test_scamp_two_phase_with_pallas(tmp_path):
    """Simulator(algo='scamp', use_pallas=True, two_phase) matches the
    single-phase fused decode (two-phase must not change the trajectory;
    kernel-vs-kernel so borderline 1e-5 allclose flips from the kernel's
    different f32 accumulation order don't enter)."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="sparc",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=30)
    s1 = Simulator(cfg, algo="scamp", out_root=str(tmp_path / "a"),
                   use_pallas=True)
    s2 = Simulator(cfg, algo="scamp", out_root=str(tmp_path / "b"),
                   two_phase=6, use_pallas=True)
    a1 = s1.run_point(8.0, epochs=64, res=32)
    a2 = s2.run_point(8.0, epochs=64, res=32)
    for k, v in a1.items():
        assert a2[k] == pytest.approx(v, rel=1e-4, abs=1e-6), k
