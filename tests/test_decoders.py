"""Decoder parity vs single-trial NumPy oracles (SURVEY §2b state machines),
including the per-trial early-stop / iteration-count semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp, scamp, vamp, vamp2
from amp_sparc_spatialmodulation_tpu.ops import channel, message


def _setup(seed=0, snr_db=12.0, B=3, **kw):
    base = dict(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                iterations=30, alphabet="QPSK", profile="uniform",
                trunc="tail")
    base.update(kw)
    cfg = Config(**base)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    W, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** (snr_db / 10)
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    return cfg, np.asarray(W), np.asarray(A), msg, np.asarray(y), cfg.E / snr


def test_bamp_matches_oracle_per_trial():
    cfg, W, A, msg, y, sigma2 = _setup()
    res = bamp.decode(jnp.asarray(A), jnp.asarray(y), sigma2, cfg)
    symbols = np.asarray(cfg.symbols)
    for b in range(y.shape[0]):
        xmap_ref, xmmse_ref, _, T_ref = oracle.bamp(
            A, y[b], sigma2, symbols, cfg.L, cfg.M, cfg.N_Layers)
        assert int(res.T[b]) == T_ref
        np.testing.assert_allclose(np.asarray(res.xmmse[b]), xmmse_ref,
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.xmap[b]), xmap_ref,
                                   atol=5e-3)


def test_bamp_batching_equals_serial():
    """Batched decode must equal per-trial decode (freeze correctness)."""
    cfg, W, A, msg, y, sigma2 = _setup(seed=5, B=4)
    res = bamp.decode(jnp.asarray(A), jnp.asarray(y), sigma2, cfg)
    for b in range(4):
        solo = bamp.decode(jnp.asarray(A), jnp.asarray(y[b:b + 1]),
                           sigma2, cfg)
        assert int(res.T[b]) == int(solo.T[0])
        np.testing.assert_allclose(np.asarray(res.xmmse[b]),
                                   np.asarray(solo.xmmse[0]), atol=1e-5)


def test_vamp_matches_oracle_per_trial():
    cfg, W, A, msg, y, sigma2 = _setup(seed=1, snr_db=14.0)
    dec = vamp.svd(jnp.asarray(A))
    res = vamp.decode(dec, jnp.asarray(y), sigma2, cfg)
    U, s, Vh = np.asarray(dec.U), np.asarray(dec.s), np.asarray(dec.Vh)
    symbols = np.asarray(cfg.symbols)
    for b in range(y.shape[0]):
        r_ref, xmmse_ref, _, T_ref = oracle.vamp(
            U, s, Vh, y[b], sigma2, cfg.sparsity, symbols, cfg.L, cfg.M,
            cfg.N_Layers)
        assert abs(int(res.T[b]) - T_ref) <= 1
        np.testing.assert_allclose(np.asarray(res.xmmse[b]), xmmse_ref,
                                   atol=2e-2)


def test_gram_svd_matches_direct():
    """The Gram-eigendecomposition SVD (the TPU default — eigh of the
    small-side Gram instead of the full bidiagonal SVD) factors A exactly
    and produces an iteration-identical VAMP decode: VAMP's LMMSE uses
    s**2 and is phase-invariant per singular vector."""
    cfg, W, A, msg, y, sigma2 = _setup(seed=3, snr_db=14.0)
    A = jnp.asarray(A)
    for mat in (A, A.T.conj()):            # wide and tall branches
        dec = vamp.svd(mat, method="gram")
        rec = (dec.U * dec.s[None, :]) @ dec.Vh
        np.testing.assert_allclose(np.asarray(rec), np.asarray(mat),
                                   atol=1e-4)
        eye = np.asarray(jnp.conj(dec.U).T @ dec.U)
        np.testing.assert_allclose(eye, np.eye(eye.shape[0]), atol=1e-4)
        eye = np.asarray(dec.Vh @ jnp.conj(dec.Vh).T)
        np.testing.assert_allclose(eye, np.eye(eye.shape[0]), atol=1e-4)
    d_dir = vamp.svd(A, method="direct")
    d_grm = vamp.svd(A, method="gram")
    np.testing.assert_allclose(np.asarray(d_grm.s), np.asarray(d_dir.s),
                               atol=1e-4)
    r_dir = vamp.decode(d_dir, jnp.asarray(y), sigma2, cfg)
    r_grm = vamp.decode(d_grm, jnp.asarray(y), sigma2, cfg)
    for b in range(y.shape[0]):
        assert abs(int(r_dir.T[b]) - int(r_grm.T[b])) <= 1
    np.testing.assert_allclose(np.asarray(r_grm.xmmse),
                               np.asarray(r_dir.xmmse), atol=2e-2)


def test_scamp_matches_oracle_per_trial():
    cfg, W, A, msg, y, sigma2 = _setup(seed=2, mode="sparc", snr_db=16.0)
    res = scamp.decode(jnp.asarray(W), jnp.asarray(A), jnp.asarray(y),
                       sigma2, cfg)
    symbols = np.asarray(cfg.symbols)
    for b in range(y.shape[0]):
        xmap_ref, xmmse_ref, _, T_ref = oracle.scamp(
            W, A, y[b], sigma2, symbols, cfg.Na, cfg.Lc, cfg.Lr, cfg.Mc,
            cfg.Mr, cfg.N_Layers)
        assert abs(int(res.T[b]) - T_ref) <= 1
        np.testing.assert_allclose(np.asarray(res.xmmse[b]), xmmse_ref,
                                   atol=2e-2)


def test_vamp2_runs_and_decodes():
    cfg, W, A, msg, y, sigma2 = _setup(seed=3, snr_db=16.0)
    dec = vamp.svd(jnp.asarray(A))
    res = vamp2.decode(dec, jnp.asarray(y), sigma2, cfg)
    assert res.xmap.shape == msg.x.shape
    assert np.all(np.asarray(res.T) >= 1)
    # The reference vamp2 is a stale side-by-side variant that feeds its
    # precision `gamma` into a variance-expecting denoiser (`vamp2.py:62`);
    # we reproduce that behavior, so only require finite output that beats
    # the trivial zero estimator (whose NMSE is the sparsity Na/Nt = 0.25).
    nmse = float(jnp.mean(jnp.abs(res.xmmse - msg.x) ** 2))
    assert np.isfinite(nmse) and nmse < cfg.sparsity


def test_bamp_random_mode():
    cfg, W, A, msg, y, sigma2 = _setup(seed=4, mode="random", snr_db=14.0,
                                       alphabet="OOK")
    res = bamp.decode(jnp.asarray(A), jnp.asarray(y), sigma2, cfg)
    nmse = float(jnp.mean(jnp.abs(res.xmmse - msg.x) ** 2))
    assert nmse < 0.1


def test_iteration_cap_respected():
    cfg, W, A, msg, y, sigma2 = _setup(seed=6, snr_db=-5.0, iterations=7)
    res = bamp.decode(jnp.asarray(A), jnp.asarray(y), sigma2, cfg)
    assert np.all(np.asarray(res.T) <= 7)


def test_scamp_estimate_phi_variant():
    cfg, W, A, msg, y, sigma2 = _setup(seed=7, mode="sparc", snr_db=16.0)
    res = scamp.decode(jnp.asarray(W), jnp.asarray(A), jnp.asarray(y),
                       sigma2, cfg, estimate_phi=True)
    nmse = float(jnp.mean(jnp.abs(res.xmmse - msg.x) ** 2))
    assert nmse < 0.2


def test_vamp2_needs_direct_svd():
    """vamp2 whitens by dividing by s (`vamp2.py:22`): the Gram-eigh SVD
    zeroes singular values below ~sqrt(eps)*s_max, which that division
    turns into inf — so the sweep engine pins method='direct' for vamp2.
    This pins the hazard itself: an ill-conditioned matrix whose direct
    SVD is finite-safe while the gram route returns exact zeros."""
    import numpy as np

    from amp_sparc_spatialmodulation_tpu.models import vamp

    rng = np.random.default_rng(0)
    n, N = 32, 128
    U0, _ = np.linalg.qr(rng.standard_normal((n, n))
                         + 1j * rng.standard_normal((n, n)))
    V0, _ = np.linalg.qr(rng.standard_normal((N, n))
                         + 1j * rng.standard_normal((N, n)))
    s0 = np.geomspace(1.0, 1e-5, n)
    A = (U0 * s0) @ V0.conj().T
    s_direct = np.asarray(vamp.svd(jnp.asarray(A, jnp.complex64),
                                   method="direct").s)
    s_gram = np.asarray(vamp.svd(jnp.asarray(A, jnp.complex64),
                                 method="gram").s)
    assert s_direct.min() > 0            # safe to divide by
    assert s_gram.min() == 0.0           # the hazard the pin guards
