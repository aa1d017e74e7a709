"""Fused whole-decode vamp2 kernel vs the XLA path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import vamp, vamp2
from amp_sparc_spatialmodulation_tpu.ops import channel, message


def _setup(B=8, seed=0, snr_exp=1.5, alphabet="OOK", iterations=12):
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet=alphabet, profile="uniform", trunc="tail",
                 iterations=iterations)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** snr_exp
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    # vamp2 whitens by dividing by s — direct SVD required
    return cfg, vamp.svd(A, method="direct"), y, cfg.sigma2(snr)


@pytest.mark.parametrize("alphabet,snr_exp", [("OOK", 1.5), ("QPSK", 1.9)])
def test_fused_vamp2_matches_xla(alphabet, snr_exp):
    cfg, dec, y, s2 = _setup(alphabet=alphabet, snr_exp=snr_exp)
    r_x = vamp2.decode(dec, y, s2, cfg)
    r_p = vamp2.decode(dec, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    # xmap here is the pseudo-data r, whose extrinsic subtraction divides
    # by (1 - alpha) — an amplifier of f32 accumulation-order noise; the
    # bounded posterior outputs stay tight (same bounds as the VAMP
    # kernel test).
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 5e-2
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-3
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-3


def test_fused_vamp2_resumable():
    """Split at an iteration cap, resume, and match the unsplit decode —
    the contract two-phase continuation batching relies on."""
    cfg, dec, y, s2 = _setup(iterations=10)
    full = vamp2.decode(dec, y, s2, cfg, use_pallas=True)
    _, st = vamp2.decode(dec, y, s2, cfg, use_pallas=True, iter_cap=4,
                         return_state=True)
    resumed = vamp2.decode(dec, y, s2, cfg, use_pallas=True, state0=st)
    np.testing.assert_array_equal(np.asarray(full.T),
                                  np.asarray(resumed.T))
    assert float(jnp.max(jnp.abs(full.xmmse - resumed.xmmse))) < 1e-6


def test_vamp2_simulator_with_pallas(tmp_path):
    """End-to-end Simulator point with the vamp2 kernel on (interpret)."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=15)
    s1 = Simulator(cfg, algo="vamp2", out_root=str(tmp_path / "a"))
    s2 = Simulator(cfg, algo="vamp2", out_root=str(tmp_path / "b"),
                   use_pallas=True)
    a1 = s1.run_point(8.0, epochs=64, res=32)
    a2 = s2.run_point(8.0, epochs=64, res=32)
    assert a2["fer"] == pytest.approx(a1["fer"], abs=2 / 64)
    assert a2["T"] == pytest.approx(a1["T"], rel=0.05)
