"""Analysis layer: artifacts schema, plotting, info theory, capacity, CLI."""
import json
import os

import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.utils import artifacts, info_theory
from amp_sparc_spatialmodulation_tpu.utils.metrics import METRIC_KEYS


def _cfg(**kw):
    base = dict(Nt=8, Na=2, Nr=4, Lin=4, Lh=2, mode="segmented",
                alphabet="QPSK", trunc="tail", profile="uniform",
                iterations=10)
    base.update(kw)
    return Config(**base)


def _fake_avg(fer=0.1):
    avg = {k: fer for k in METRIC_KEYS}
    avg["T"] = 5.0
    return avg


def test_artifact_schema_roundtrip(tmp_path):
    cfg = _cfg()
    d = str(tmp_path / "BAMP" / cfg.name)
    path = artifacts.export_point(d, 8.0, 8.5, cfg, _fake_avg())
    data = json.load(open(path))
    # exact reference key order (`loss.py:304-323`)
    assert list(data.keys()) == (["T"] + list(METRIC_KEYS)
                                 + ["EbN0dB", "SNRdB", "rate", "C",
                                    "ShannonLimitdB"])
    assert data["C"] == pytest.approx(np.log2(1 + 10 ** 0.85))
    assert os.path.basename(path) == "8.0.json"
    pts = artifacts.load_points(d)
    assert 8.0 in pts and pts[8.0]["fer"] == pytest.approx(0.1)


def test_manifest_resume(tmp_path):
    cfg = _cfg()
    d = str(tmp_path / "X" / cfg.name)
    artifacts.update_manifest(d, 8.0, 100, seed=3)
    m = artifacts.load_manifest(d)
    assert m["points"]["8.0"] == {"trials": 100, "seed": 3}


def test_plotter(tmp_path):
    cfg = _cfg()
    d = str(tmp_path / "BAMP" / cfg.name)
    for e, fer in [(6.0, 0.5), (7.0, 0.1), (8.0, 0.01)]:
        artifacts.export_point(d, e, e + 0.8, cfg, _fake_avg(fer))
    from amp_sparc_spatialmodulation_tpu.utils.plotting import Plotter

    p = Plotter(cfg, "BAMP", out_root=str(tmp_path))
    png1 = p.plot_metrics()
    png2 = p.plot_iter()
    assert os.path.exists(png1) and os.path.exists(png2)
    m = p.get_metrics()
    np.testing.assert_allclose(m["EbN0dB"], [6.0, 7.0, 8.0])
    np.testing.assert_allclose(m["fer"], [0.5, 0.1, 0.01])


def test_mi_dmc_bsc():
    # BSC with crossover p: MI = 1 - H2(p)
    p = 0.11
    pmf_y_x = np.array([[1 - p, p], [p, 1 - p]])
    h2 = -p * np.log2(p) - (1 - p) * np.log2(1 - p)
    assert info_theory.mi_dmc(np.array([0.5, 0.5]),
                              pmf_y_x) == pytest.approx(1 - h2, rel=1e-6)


def test_mi_awgn_limits():
    # BPSK at high SNR -> 1 bit; at very low SNR -> ~0 bits.
    x = np.array([-1.0, 1.0])
    pmf = np.array([0.5, 0.5])
    hi = info_theory.mi_awgn(x, pmf, snrdB=np.array([15.0]), N=400)
    lo = info_theory.mi_awgn(x, pmf, snrdB=np.array([-25.0]), N=400)
    assert hi[0] == pytest.approx(1.0, abs=0.02)
    assert lo[0] == pytest.approx(0.0, abs=0.02)


def test_calc_mi_roundtrip():
    var = np.array([4.0, 9.0])
    mi = info_theory.calc_mi(var, "MI")
    assert np.all((mi > 0) & (mi < 1))
    back = info_theory.calc_mi(mi, "VAR")
    np.testing.assert_allclose(back, var, rtol=0.3)


def test_capacity_simulate(tmp_path):
    from amp_sparc_spatialmodulation_tpu.models.capacity import InfoTheory

    cfg = _cfg()
    it = InfoTheory(cfg, out_root=str(tmp_path))
    out = it.simulate(epochs=2, start=2.0, final=3.0, step=1.0,
                      grid_points=40, progress=lambda s: None)
    assert out.shape == (2, 4)
    # Cwf is positive and MI bounded by the index+symbol entropy per use
    assert np.all(out[:, 2] > 0)
    csvs = [f for f in os.listdir(it.path) if f.endswith(".csv")]
    assert len(csvs) == 1


def test_cli_sweep_and_plot(tmp_path):
    from amp_sparc_spatialmodulation_tpu.cli import main

    rc = main(["sweep", "--Nt", "8", "--Na", "2", "--Nr", "6", "--Lin", "4",
               "--Lh", "2", "--alphabet", "OOK", "--iterations", "20",
               "--epochs", "16", "--res", "8", "--start", "8", "--final",
               "10", "--out", str(tmp_path), "--plot"])
    assert rc == 0
    cfg = Config(Nt=8, Na=2, Nr=6, Lin=4, Lh=2, mode="segmented",
                 alphabet="OOK", trunc="tail", profile="uniform",
                 iterations=20)
    d = os.path.join(str(tmp_path), "BAMP", cfg.name)
    assert any(f.endswith(".json") for f in os.listdir(d))
    assert any(f.endswith(".png") for f in os.listdir(d))


def test_mi_awgn2_matches_reference_routine_real_alphabet():
    """mi_awgn2 is a delegate to mi_awgn(noise_var=...); pin it against an
    independent replica of the reference's separate mi_awgn2 implementation
    (`info_theory.py:138-201`) on a REAL alphabet — the sigma^2-doubling
    convention (grid width from the DOUBLED sigma, doubled variance in the
    exponent) lives exactly there."""

    def reference_mi_awgn2(x, pmf_x, noise_var, N):
        # Line-by-line replica of /root/reference/info_theory.py:138-201
        # (real-alphabet branch), kept as an independent oracle.
        sigma2N = np.array(noise_var, float)
        if np.isrealobj(x):
            sigma2N = sigma2N * 2.0
        sigmaN = np.sqrt(sigma2N)
        xmax = np.amax(np.abs(x))
        mi = np.zeros(len(noise_var))
        for c in range(len(noise_var)):
            ymax = xmax + 10 * sigmaN[c]
            y = np.linspace(-ymax, ymax, N)
            pmf_y_x = np.zeros((len(y), len(x)))
            pmf_y = np.zeros(len(y))
            for k, xk in enumerate(x):
                tmp = np.exp(-np.abs(y - xk) ** 2 / sigma2N[c])
                pmf_y_x[:, k] = tmp / np.sum(tmp)
                pmf_y += pmf_y_x[:, k] * pmf_x[k]
            log_yx = np.zeros(pmf_y_x.shape)
            ptr = np.nonzero(pmf_y_x)
            log_yx[ptr] = np.log2(pmf_y_x[ptr])
            log_y = np.zeros(pmf_y.shape)
            ptr = np.nonzero(pmf_y)
            log_y[ptr] = np.log2(pmf_y[ptr])
            for k in range(len(x)):
                mi[c] += np.sum(pmf_y_x[:, k]
                                * (log_yx[:, k] - log_y)) * pmf_x[k]
        return mi

    x = np.array([-3.0, -1.0, 1.0, 3.0])          # real 4ASK-like alphabet
    pmf_x = np.full(4, 0.25)
    noise_var = np.array([0.1, 0.5, 2.0])
    want = reference_mi_awgn2(x, pmf_x, noise_var, N=801)
    got = info_theory.mi_awgn2(x, pmf_x, noise_var, N=801)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # and the complex branch (no doubling)
    xc = np.array([1 + 0j, -1 + 0j, 1j, -1j])
    got_c = info_theory.mi_awgn2(xc, pmf_x, np.array([0.5]), N=81)
    got_c2 = info_theory.mi_awgn(xc, pmf_x, noise_var=np.array([0.5]), N=81)
    np.testing.assert_allclose(got_c, got_c2, rtol=1e-12)


def test_capacity_device_mi_matches_host_routine():
    """The batched device MI kernel must agree with the host-side
    _mutual_information reference twin (`capacity.py:101-137`)."""
    from amp_sparc_spatialmodulation_tpu.models.capacity import InfoTheory

    cfg = _cfg()
    it = InfoTheory(cfg, out_root="/tmp/cap_mi_test")
    rng = np.random.default_rng(0)
    g = np.sort(rng.gamma(2.0, 1.0, size=12))[::-1].astype(np.float32)
    snr = 10 ** 0.8
    host = it._mutual_information(g, snr, N=50)
    dev = float(np.asarray(it._mi_device_fn(50)(
        np.asarray(g)[None, :], np.float32(snr)))[0])
    np.testing.assert_allclose(dev, host, rtol=2e-4)
