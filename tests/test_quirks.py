"""Pin the deliberate behavioral divergences from the reference (see
docs/COVERAGE.md "Deliberate divergences") so they stay decisions, not
accidents:

1. iber is batch-invariant: the reference truncates index-XOR popcounts to
   ceil(log2(Lin*B*Na)) with ITS batch size (`/root/reference/loss.py:20`);
   we pin the per-frame (B=1) convention of every published final sweep.
2. Capacity CSV exports Mi = max over epochs; the reference computes the
   max but exports the LAST epoch's value (`/root/reference/capacity.py:49-51`).
3. _mutual_information receives the SNR its signature declares; the
   reference passes sigma2 into an SNR parameter
   (`/root/reference/capacity.py:46` vs `:101,111`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models.capacity import InfoTheory
from amp_sparc_spatialmodulation_tpu.ops import message
from amp_sparc_spatialmodulation_tpu.utils import metrics


def _noisy_eval(cfg, B, key, split):
    """Metric sums of the same B noisy frames evaluated in `split` chunks."""
    k1, k2 = jax.random.split(key)
    msg = message.generate_message(k1, cfg, B)
    noise = 0.7 * (jax.random.normal(k2, msg.x.shape)
                   + 1j * jax.random.normal(jax.random.fold_in(k2, 1),
                                            msg.x.shape))
    xmap = msg.x + noise.astype(msg.x.dtype)
    T = jnp.full((B,), 5, jnp.int32)
    step = B // split
    total = None
    for i in range(split):
        sl = slice(i * step, (i + 1) * step)
        sub = message.Message(x=msg.x[sl], ant=msg.ant[sl], sym=msg.sym[sl],
                              gray=msg.gray[sl],
                              flat=msg.flat[sl] - i * step * cfg.Lin * cfg.Nt)
        sums = metrics.evaluate_sums(xmap[sl], xmap[sl], sub, T[sl], cfg)
        total = metrics.accumulate(total, sums)
    return metrics.finalize(total, cfg)


@pytest.mark.parametrize("mode", ["segmented", "random"])
def test_iber_invariant_to_batch_split(mode):
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=5, Lh=2, mode=mode,
                 alphabet="QPSK", profile="uniform", trunc="tail")
    key = jax.random.PRNGKey(0)
    full = _noisy_eval(cfg, 8, key, split=1)
    halves = _noisy_eval(cfg, 8, key, split=2)
    eighths = _noisy_eval(cfg, 8, key, split=8)
    assert full["iber"] > 0                     # the noise causes errors
    for k in ("iber", "sber", "ber", "ier", "ser"):
        assert halves[k] == pytest.approx(full[k], rel=1e-6), k
        assert eighths[k] == pytest.approx(full[k], rel=1e-6), k


def _tiny_capacity(tmp_path):
    cfg = Config(Nt=4, Na=1, Nr=4, Lin=2, Lh=2, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail")
    return InfoTheory(cfg, out_root=str(tmp_path))


def test_capacity_exports_max_mi_over_epochs(tmp_path, monkeypatch):
    """Deliberate divergence: we export max-over-epochs Mi; the reference
    exports the last epoch's mi despite computing the max."""
    it = _tiny_capacity(tmp_path)
    vals = iter([0.5, 2.0, 1.0])                # max=2.0, last=1.0
    monkeypatch.setattr(it, "_mutual_information",
                        lambda g, snr, N=100: next(vals))
    out = it.simulate(epochs=3, start=4.0, final=4.0, grid_points=5,
                      progress=lambda *_: None)
    assert out[0, -1] == pytest.approx(2.0)     # max, not 1.0 (last)


def test_capacity_passes_snr_not_sigma2(tmp_path, monkeypatch):
    """Deliberate divergence (reference bug fix): _mutual_information's SNR
    parameter receives the SNR, not sigma2 = 1/SNR."""
    it = _tiny_capacity(tmp_path)
    seen = []

    def spy(g, snr, N=100):
        seen.append(float(snr))
        return 0.0

    monkeypatch.setattr(it, "_mutual_information", spy)
    ebn0 = 6.0
    it.simulate(epochs=1, start=ebn0, final=ebn0, grid_points=5,
                progress=lambda *_: None)
    snr_db = ebn0 + 10 * np.log10(it.cfg.code_rate)
    assert seen[0] == pytest.approx(10 ** (snr_db / 10))


def test_mutual_information_increases_with_snr(tmp_path):
    """Sanity on the SNR semantics: MI must grow with SNR."""
    it = _tiny_capacity(tmp_path)
    g = np.ones(2)
    lo = it._mutual_information(g, 1.0, N=41)
    hi = it._mutual_information(g, 100.0, N=41)
    assert hi > lo + 0.1
