"""SPARC tools: rate math, power allocation, power-allocated base matrix,
single-trial experiment (`sparc.py` twin capabilities)."""
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import sparc_tools as st


def test_rate_math():
    # `sparc.py:19`: rate = Lt*log(Nt*K)/n with n = (Lt+Lh-1)*Nr
    r = st.sparc_rate_nats(Nt=128, K=4, Lt=20, Lh=3, Nr=32)
    assert r == pytest.approx(20 * np.log(512) / (22 * 32))
    r2 = st.segmented_sparc_rate_nats(Nt=128, Na=8, Nr=24, Lt=20, Lh=3, K=1)
    assert r2 == pytest.approx(20 * 8 * np.log(16) / (22 * 24))
    assert st.ebn0_min_db(1.0) == pytest.approx(0.0)


def test_exp_power_allocation():
    snr = 10.0
    pa = st.exp_power_allocation(snr, Lt=16)
    assert pa.shape == (16,)
    assert pa[0] == pytest.approx(1.0)
    assert np.all(np.diff(pa) < 0)          # strictly decaying
    # flattened variant (`sparc.py:98-101`)
    pa2 = st.exp_power_allocation(snr, Lt=16, f=0.5, a=1.0)
    assert np.allclose(pa2[8:], pa2[8])     # flat tail
    with pytest.raises(ValueError):
        st.exp_power_allocation(snr, Lt=16, f=2.0, a=1.0)


def test_base_matrix_pa_normalization():
    # mean(W) ~ mean signal power = 1 with uniform pa (`sparc.py:67-84`)
    pdp = np.ones(3) / 3
    W = st.base_matrix_pa(Lt=8, Lh=3, pdp=pdp)
    assert W.shape == (10, 8)
    # column sums: each column carries Lr/Lh * sum(pdp) = Lr/Lh * 1
    np.testing.assert_allclose(W.sum(0), 10 / 3, rtol=1e-6)
    pa = st.exp_power_allocation(5.0, Lt=8)
    Wpa = st.base_matrix_pa(Lt=8, Lh=3, pdp=pdp, power_allocation=pa)
    ratio = Wpa.sum(0) / W.sum(0)
    np.testing.assert_allclose(ratio, pa / pa.mean(), rtol=1e-6)


def test_run_single_trial_high_snr_decodes():
    cfg = Config(Nt=16, Na=2, Nr=12, Lin=6, Lh=2, mode="sparc",
                 alphabet="QPSK", profile="uniform", trunc="tail",
                 iterations=40)
    res = st.run_single_trial(cfg, ebn0_db=14.0, algo="bamp", seed=1)
    assert res.fer in (0.0, 1.0)
    assert res.nmse < 0.5
    res2 = st.run_single_trial(cfg, ebn0_db=14.0, algo="scamp",
                               estimate_phi=True, seed=1)
    assert 0.0 <= res2.ser <= 1.0


def test_run_single_with_power_allocation():
    cfg = Config(Nt=16, Na=2, Nr=12, Lin=6, Lh=2, mode="sparc",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    pa = st.exp_power_allocation(8.0, Lt=cfg.Lin)
    res = st.run_single_trial(cfg, ebn0_db=12.0, algo="scamp",
                              power_allocation=pa, seed=2)
    assert np.isfinite(res.nmse)


def test_compare_single_trial_shared_draw():
    """Head-to-head SCAMP-vs-BAMP on ONE shared draw (`sparc.py:453-474`):
    results must equal the per-algorithm runs with the same seed."""
    cfg = Config(Nt=16, Na=2, Nr=12, Lin=6, Lh=2, mode="sparc",
                 alphabet="QPSK", profile="uniform", trunc="tail",
                 iterations=40)
    both = st.compare_single_trial(cfg, ebn0_db=14.0, seed=1)
    assert set(both) == {"scamp", "bamp"}
    solo_b = st.run_single_trial(cfg, ebn0_db=14.0, algo="bamp", seed=1)
    solo_s = st.run_single_trial(cfg, ebn0_db=14.0, algo="scamp", seed=1)
    assert both["bamp"] == solo_b
    assert both["scamp"] == solo_s
