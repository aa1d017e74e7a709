"""Channel construction parity (vs NumPy kron oracle) and statistical
invariants (the `test.ipynb` checks of SURVEY §4, made into asserts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.ops import channel, message


def _cfg(trunc="tail", **kw):
    base = dict(Nt=8, Na=2, Nr=4, Lin=6, Lh=3, mode="segmented",
                alphabet="QPSK", profile="exponential", trunc=trunc)
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("trunc", ["trunc", "tail", "cyclic"])
def test_dense_toeplitz_matches_kron_oracle(trunc):
    cfg = _cfg(trunc=trunc)
    rng = np.random.default_rng(0)
    h = (rng.normal(size=(cfg.Lh, cfg.Nr, cfg.Nt))
         + 1j * rng.normal(size=(cfg.Lh, cfg.Nr, cfg.Nt)))
    ours = np.asarray(channel.dense_from_taps(jnp.asarray(h, jnp.complex64),
                                              cfg))
    ref = oracle.dense_toeplitz(h, cfg.Lin, cfg.Lout, trunc)
    assert ours.shape == (cfg.Nr * cfg.Lout, cfg.Nt * cfg.Lin)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_dense_sparc_matches_oracle():
    cfg = _cfg()
    W = channel.base_matrix(cfg)
    rng = np.random.default_rng(1)
    h = (rng.normal(size=(cfg.Lh, cfg.Nr, cfg.Nt))
         + 1j * rng.normal(size=(cfg.Lh, cfg.Nr, cfg.Nt)))
    ours = np.asarray(channel.dense_sparc_from_taps(
        jnp.asarray(h, jnp.complex64), W, cfg))
    ref = oracle.dense_sparc(h, np.asarray(W, float), cfg.Lin, cfg.Lout)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_base_matrix_normalization():
    # `channel.py:83`: W normalized so mean(W) = Na/Nr.
    for profile in ("uniform", "exponential"):
        cfg = _cfg(profile=profile)
        W = channel.base_matrix(cfg)
        assert np.mean(W) == pytest.approx(cfg.Na / cfg.Nr, rel=1e-6)


def test_toeplitz_column_energy():
    # E[||column||^2] = Lout/Lin (test.ipynb invariant).
    cfg = _cfg(Lin=8, Nr=16, Nt=16)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    energies = []
    for k in keys:
        H = np.asarray(channel.generate_channel(k, cfg))
        energies.append(np.mean(np.sum(np.abs(H) ** 2, axis=0)))
    assert np.mean(energies) == pytest.approx(cfg.Lout / cfg.Lin, rel=0.05)


def test_sparc_received_power():
    # E[|A x|^2] per entry should equal Na/Nr = the signal energy E used by
    # the decoders' sigma2 = E/SNR convention.
    cfg = _cfg(Lin=8, Nr=16, Nt=32, Na=4)
    key = jax.random.PRNGKey(0)
    p = []
    for i in range(8):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        _, A = channel.generate_as_sparc(k1, cfg)
        msg = message.generate_message(k2, cfg, 16)
        y = msg.x @ A.T
        p.append(float(jnp.mean(jnp.abs(y) ** 2)))
    assert np.mean(p) == pytest.approx(cfg.Na / cfg.Nr, rel=0.1)


def test_awgn_variance():
    cfg = _cfg()
    snr = 4.0
    w = np.asarray(channel.awgn(jax.random.PRNGKey(3), cfg, snr, 512))
    target = cfg.Na / cfg.Nr / snr
    assert np.mean(np.abs(w) ** 2) == pytest.approx(target, rel=0.05)
    assert w.shape == (512, cfg.Nr * cfg.Lout)


def test_iid_random_variance():
    cfg = _cfg()
    H = np.asarray(channel.generate_as_random(jax.random.PRNGKey(4), cfg))
    assert np.mean(np.abs(H) ** 2) == pytest.approx(
        1.0 / (cfg.Lin * cfg.Nr), rel=0.05)
