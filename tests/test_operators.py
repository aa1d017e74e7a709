"""Banded (tap-form) operator parity vs the dense materialization, and
banded-vs-dense decode equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp, scamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators


def _cfg(trunc="tail", **kw):
    base = dict(Nt=12, Na=3, Nr=6, Lin=8, Lh=3, mode="segmented",
                alphabet="QPSK", profile="exponential", trunc=trunc,
                iterations=25)
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("trunc", ["trunc", "tail", "cyclic"])
def test_banded_toeplitz_maps_match_dense(trunc):
    cfg = _cfg(trunc=trunc)
    key = jax.random.PRNGKey(0)
    op = operators.banded_toeplitz(key, cfg)
    H = op.densify()
    dense = operators.DenseOperator(H)
    # the same taps produce the same dense matrix as generate_channel
    np.testing.assert_allclose(
        np.asarray(H), np.asarray(channel.dense_from_taps(op.h, cfg)),
        atol=1e-6)
    rng = np.random.default_rng(1)
    B = 4
    x = jnp.asarray(rng.normal(size=(B, cfg.N))
                    + 1j * rng.normal(size=(B, cfg.N)), jnp.complex64)
    z = jnp.asarray(rng.normal(size=(B, cfg.n))
                    + 1j * rng.normal(size=(B, cfg.n)), jnp.complex64)
    v = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, cfg.N)), jnp.float32)
    u = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, cfg.n)), jnp.float32)
    np.testing.assert_allclose(np.asarray(op.apply(x)),
                               np.asarray(dense.apply(x)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(op.apply_adj(z)),
                               np.asarray(dense.apply_adj(z)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(op.apply_abs2(v)),
                               np.asarray(dense.apply_abs2(v)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(op.apply_abs2T(u)),
                               np.asarray(dense.apply_abs2T(u)), atol=1e-4)


def test_banded_sparc_matches_dense_generation():
    cfg = _cfg(profile="uniform")
    key = jax.random.PRNGKey(2)
    W, op = operators.banded_sparc(key, cfg)
    # identical taps → identical dense matrix as generate_as_sparc
    W2, A2 = channel.generate_as_sparc(key, cfg)
    np.testing.assert_allclose(np.asarray(op.densify()), np.asarray(A2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(W), np.asarray(W2), atol=1e-6)


def test_bamp_banded_equals_dense_iteration():
    """A few fixed iterations must agree tightly (full decodes can diverge
    at marginal SNR where AMP trajectories amplify rounding differences)."""
    cfg = _cfg(profile="uniform", iterations=3)
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    A = op.densify()
    msg = message.generate_message(k2, cfg, 4)
    snr = 10 ** (1.2)
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, 4)
    r_banded = bamp.decode(op, y, cfg.sigma2(snr), cfg)
    r_dense = bamp.decode(A, y, cfg.sigma2(snr), cfg)
    np.testing.assert_allclose(np.asarray(r_banded.xmap),
                               np.asarray(r_dense.xmap), atol=2e-3)


def test_bamp_banded_equals_dense_decode_high_snr():
    cfg = _cfg(profile="uniform")
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    A = op.densify()
    msg = message.generate_message(k2, cfg, 4)
    snr = 10 ** 2.5
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, 4)
    r_banded = bamp.decode(op, y, cfg.sigma2(snr), cfg)
    r_dense = bamp.decode(A, y, cfg.sigma2(snr), cfg)
    np.testing.assert_array_equal(np.asarray(r_banded.T),
                                  np.asarray(r_dense.T))
    np.testing.assert_allclose(np.asarray(r_banded.xmmse),
                               np.asarray(r_dense.xmmse), atol=1e-3)


def test_scamp_banded_equals_dense_decode():
    cfg = _cfg(mode="sparc", profile="uniform")
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    A = op.densify()
    msg = message.generate_message(k2, cfg, 3)
    snr = 10 ** 2.5
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, 3)
    r_banded = scamp.decode(W, op, y, cfg.sigma2(snr), cfg)
    r_dense = scamp.decode(W, A, y, cfg.sigma2(snr), cfg)
    np.testing.assert_array_equal(np.asarray(r_banded.T),
                                  np.asarray(r_dense.T))
    np.testing.assert_allclose(np.asarray(r_banded.xmmse),
                               np.asarray(r_dense.xmmse), atol=1e-3)


def test_banded_realization_fn_runs():
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    cfg = _cfg(profile="uniform")
    fn = montecarlo.make_realization_fn(cfg, "bamp", "sparc", res=4,
                                        operator_form="banded")
    sums = fn(jax.random.PRNGKey(5), jnp.asarray(12.0, jnp.float32))
    assert float(sums["trials"]) == 4
    with pytest.raises(ValueError):
        montecarlo.make_realization_fn(cfg, "vamp", "sparc", res=4,
                                       operator_form="banded")
