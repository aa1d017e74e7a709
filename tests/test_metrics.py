"""Metrics parity vs a NumPy reimplementation of the reference ``Loss``
semantics (`loss.py:43-302`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.ops.message import Message
from amp_sparc_spatialmodulation_tpu.utils import metrics


def _np_segmented_decision(xamp, symbols, gray, L, M):
    """Reference-style loops (`loss.py:223-250`), single frame."""
    seg = xamp.reshape(L, M)
    xhat = np.zeros_like(seg)
    ghat = np.zeros((L, M), int)
    for j in range(L):
        ind = int(np.argmax(np.abs(seg[j])))
        d = np.inf
        for i, s in enumerate(symbols):
            ds = np.abs(seg[j, ind] - s)
            if ds < d:
                d = ds
                ghat[j, ind] = gray[i]
                xhat[j, ind] = s
    flat = np.flatnonzero(xhat.ravel())
    return xhat.ravel(), ghat.ravel()[flat], flat


def _popcount_low(a, bits):
    mask = (1 << bits) - 1
    return sum(bin(int(v) & mask).count("1") for v in np.asarray(a).ravel())


def _make_case(seed=0):
    cfg = Config(Nt=8, Na=2, Nr=4, Lin=4, Lh=2, mode="segmented",
                 alphabet="QPSK", trunc="tail")
    rng = np.random.default_rng(seed)
    B = 3
    symbols = np.asarray(cfg.symbols)
    ant = rng.integers(0, cfg.M, size=(B, cfg.L)).astype(np.int32)
    sym = rng.integers(0, cfg.K, size=(B, cfg.L)).astype(np.int32)
    x = np.zeros((B, cfg.L, cfg.M), complex)
    for b in range(B):
        for l in range(cfg.L):
            x[b, l, ant[b, l]] = symbols[sym[b, l]]
    base = (np.arange(B)[:, None] * cfg.L + np.arange(cfg.L)) * cfg.M
    msg = Message(x=jnp.asarray(x.reshape(B, -1), jnp.complex64),
                  ant=jnp.asarray(ant), sym=jnp.asarray(sym),
                  gray=jnp.asarray(np.asarray(cfg.gray)[sym]),
                  flat=jnp.asarray(base + ant, jnp.int32))
    # noisy observation of x as the decision statistic
    xmap = x.reshape(B, -1) + 0.3 * (rng.normal(size=(B, cfg.L * cfg.M))
                                     + 1j * rng.normal(size=(B, cfg.L * cfg.M)))
    return cfg, msg, xmap, x.reshape(B, -1)


def test_segmented_decision_matches_reference_loops():
    cfg, msg, xmap, x = _make_case()
    dec = metrics.segmented_decision(jnp.asarray(xmap, jnp.complex64), cfg)
    symbols, gray = np.asarray(cfg.symbols), np.asarray(cfg.gray)
    for b in range(xmap.shape[0]):
        xh_ref, g_ref, flat_ref = _np_segmented_decision(
            xmap[b], symbols, gray, cfg.L, cfg.M)
        np.testing.assert_allclose(np.asarray(dec.xhat[b]), xh_ref,
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dec.gray[b]), g_ref)
        np.testing.assert_array_equal(
            np.asarray(dec.flat[b]) - b * cfg.L * cfg.M, flat_ref)


def test_metric_sums_match_reference_formulas():
    cfg, msg, xmap, x = _make_case(seed=1)
    B = 3
    xmmse = x + 0.05 * np.ones_like(x)
    sums = metrics.evaluate_sums(jnp.asarray(xmap, jnp.complex64),
                                 jnp.asarray(xmmse, jnp.complex64), msg,
                                 jnp.full((B,), 5, jnp.int32), cfg)
    fin = metrics.finalize({k: float(v) for k, v in sums.items()}, cfg)

    # NumPy recomputation of the reference formulas
    dec = metrics.segmented_decision(jnp.asarray(xmap, jnp.complex64), cfg)
    xhat = np.asarray(dec.xhat)
    neq = (xhat != x).reshape(B, cfg.Lin, cfg.Nt)
    err_use = neq.any(-1)
    assert fin["fer"] == pytest.approx(err_use.any(-1).mean())
    assert fin["ver"] == pytest.approx(err_use.mean())
    assert fin["verf"] == pytest.approx(err_use[:, 0].mean())
    assert fin["verL"] == pytest.approx(err_use[:, -1].mean())
    assert fin["nMSE"] == pytest.approx(
        np.sum(np.abs(xmmse - x) ** 2) / (B * cfg.Lin * cfg.Na), rel=1e-5)
    ier_ref = np.mean(np.asarray(dec.flat) != np.asarray(msg.flat))
    assert fin["ier"] == pytest.approx(ier_ref)
    ser_ref = np.mean(np.asarray(dec.gray) != np.asarray(msg.gray))
    assert fin["ser"] == pytest.approx(ser_ref)
    # bit metrics (`loss.py:165-179`)
    ibits_trunc = int(np.ceil(np.log2(cfg.Lin * B * cfg.Na)))
    iber_ = _popcount_low(np.bitwise_xor(np.asarray(dec.flat),
                                         np.asarray(msg.flat)),
                          ibits_trunc) / cfg.Lin / B
    sber_ = _popcount_low(np.bitwise_xor(np.asarray(dec.gray),
                                         np.asarray(msg.gray)),
                          cfg.symbol_bits) / cfg.Lin / B
    assert fin["iber"] == pytest.approx(iber_ / cfg.index_bits)
    assert fin["sber"] == pytest.approx(sber_ / cfg.symbol_bits / cfg.Na)
    assert fin["ber"] == pytest.approx(
        (iber_ + sber_) / (cfg.Na * cfg.symbol_bits + cfg.index_bits))
    assert fin["T"] == pytest.approx(5.0)


def test_perfect_decision_zero_errors():
    cfg, msg, xmap, x = _make_case(seed=2)
    sums = metrics.evaluate_sums(jnp.asarray(x, jnp.complex64),
                                 jnp.asarray(x, jnp.complex64), msg,
                                 jnp.ones((3,), jnp.int32), cfg)
    fin = metrics.finalize({k: float(v) for k, v in sums.items()}, cfg)
    for k in ("fer", "ver", "ber", "ier", "ser", "nMSE"):
        assert fin[k] == pytest.approx(0.0, abs=1e-9)


def test_random_mode_decision():
    cfg = Config(Nt=8, Na=2, Nr=4, Lin=3, Lh=2, mode="random",
                 alphabet="QPSK", trunc="tail")
    rng = np.random.default_rng(3)
    B = 2
    symbols = np.asarray(cfg.symbols)
    x = np.zeros((B, cfg.Lin, cfg.Nt), complex)
    ants = np.zeros((B, cfg.Lin, cfg.Na), int)
    syms = np.zeros((B, cfg.Lin), int)
    for b in range(B):
        for l in range(cfg.Lin):
            a = np.sort(rng.choice(cfg.Nt, cfg.Na, replace=False))
            s = rng.integers(cfg.K)
            x[b, l, a] = symbols[s]
            ants[b, l], syms[b, l] = a, s
    base = (np.arange(B)[:, None] * cfg.Lin + np.arange(cfg.Lin)) * cfg.Nt
    msg = Message(x=jnp.asarray(x.reshape(B, -1), jnp.complex64),
                  ant=jnp.asarray(ants, jnp.int32),
                  sym=jnp.asarray(syms, jnp.int32),
                  gray=jnp.asarray(
                      np.broadcast_to(np.asarray(cfg.gray)[syms][..., None],
                                      ants.shape)),
                  flat=jnp.asarray(base[..., None] + ants, jnp.int32))
    dec = metrics.random_decision(jnp.asarray(x.reshape(B, -1),
                                              jnp.complex64), cfg)
    np.testing.assert_array_equal(np.asarray(dec.flat), base[..., None] + ants)
    np.testing.assert_allclose(np.asarray(dec.xhat), x.reshape(B, -1),
                               atol=1e-6)


def test_map_decision_picks_joint_argmax():
    cfg = Config(Nt=8, Na=2, Nr=4, Lin=2, Lh=1, mode="sparc",
                 alphabet="QPSK", trunc="trunc")
    rng = np.random.default_rng(4)
    B = 2
    xamp = rng.normal(size=(B, cfg.L * cfg.M)) \
        + 1j * rng.normal(size=(B, cfg.L * cfg.M))
    dec = metrics.map_decision(jnp.asarray(xamp, jnp.complex64), cfg)
    symbols = np.asarray(cfg.symbols)
    for b in range(B):
        seg = xamp[b].reshape(cfg.L, cfg.M)
        for j in range(cfg.L):
            corr = np.real(np.outer(seg[j], symbols.conj()))
            m, k = np.unravel_index(corr.argmax(), corr.shape)
            row = np.asarray(dec.xhat[b]).reshape(cfg.L, cfg.M)[j]
            assert row[m] == pytest.approx(symbols[k], abs=1e-6)
            assert np.count_nonzero(row) == 1


def test_fetch_sums_single_transfer_equals_per_scalar():
    """fetch_sums (one stacked device->host transfer — the remote-TPU
    tunnel costs ~25 ms per round-trip, so per-scalar fetching was ~35% of
    bench wall time) must return exactly the same values as per-scalar
    float() conversion, for device pytrees, plain floats, and mixes."""
    import jax.numpy as jnp

    from amp_sparc_spatialmodulation_tpu.utils import metrics

    dev = {k: jnp.asarray(i + 0.5, jnp.float32)
           for i, k in enumerate(metrics.SUM_KEYS)}
    assert metrics.fetch_sums(dev) == {k: float(v) for k, v in dev.items()}
    # extra keys beyond SUM_KEYS survive, plain floats pass through
    dev["extra"] = jnp.asarray(7.0, jnp.float32)
    out = metrics.fetch_sums(dev)
    assert out["extra"] == 7.0 and len(out) == len(metrics.SUM_KEYS) + 1
    host = {k: float(i) for i, k in enumerate(metrics.SUM_KEYS)}
    assert metrics.fetch_sums(host) == host


def test_finalize_accepts_device_sums():
    """finalize must fetch device sums itself (one transfer) and agree with
    finalize on host floats."""
    import jax
    import jax.numpy as jnp

    from amp_sparc_spatialmodulation_tpu.config import Config
    from amp_sparc_spatialmodulation_tpu.models import bamp
    from amp_sparc_spatialmodulation_tpu.ops import channel, message
    from amp_sparc_spatialmodulation_tpu.utils import metrics

    cfg = Config(Nt=8, Na=2, Nr=6, Lin=4, Lh=2, mode="segmented",
                 iterations=20, alphabet="OOK", profile="uniform",
                 trunc="tail")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, 4)
    snr = 10 ** (12.0 / 10)
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, 4)
    res = bamp.decode(A, y, cfg.E / snr, cfg)
    sums = metrics.evaluate_sums(res.xmap, res.xmmse, msg, res.T, cfg)
    a = metrics.finalize(sums, cfg)
    b = metrics.finalize({k: float(v) for k, v in sums.items()}, cfg)
    assert a == b
