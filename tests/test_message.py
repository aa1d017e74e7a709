"""Message-generation structure and distribution tests (`data.py` parity)."""
import jax
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.ops import message


def test_segmented_structure():
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=5, Lh=2, mode="segmented",
                 alphabet="QPSK", trunc="tail")
    msg = message.generate_message(jax.random.PRNGKey(0), cfg, 7)
    x = np.asarray(msg.x)
    assert x.shape == (7, cfg.Lin * cfg.Nt)
    # exactly one active antenna per segment
    seg = x.reshape(7, cfg.L, cfg.M)
    assert np.all(np.count_nonzero(seg, axis=-1) == 1)
    # dense vector consistent with structured truth
    ant, sym = np.asarray(msg.ant), np.asarray(msg.sym)
    vals = np.asarray(cfg.symbols)[sym]
    np.testing.assert_allclose(np.take_along_axis(seg, ant[..., None],
                                                  -1)[..., 0], vals)
    # flat indices are the sorted nonzero positions of x.ravel()
    np.testing.assert_array_equal(np.sort(np.asarray(msg.flat).ravel()),
                                  np.flatnonzero(x.ravel()))
    # gray labels match the table
    np.testing.assert_array_equal(np.asarray(msg.gray),
                                  np.asarray(cfg.gray)[sym])


def test_random_structure():
    cfg = Config(Nt=16, Na=3, Nr=8, Lin=5, Lh=2, mode="random",
                 alphabet="8PSK", trunc="trunc")
    msg = message.generate_message(jax.random.PRNGKey(1), cfg, 6)
    x = np.asarray(msg.x).reshape(6, cfg.Lin, cfg.Nt)
    # exactly Na active antennas per channel use, all same symbol
    assert np.all(np.count_nonzero(x, axis=-1) == cfg.Na)
    ant = np.asarray(msg.ant)
    assert np.all(np.diff(ant, axis=-1) > 0)  # sorted, distinct
    vals = np.take_along_axis(x, ant, axis=-1)
    assert np.allclose(vals, vals[..., :1])   # one symbol per channel use
    np.testing.assert_array_equal(np.sort(np.asarray(msg.flat).ravel()),
                                  np.flatnonzero(np.asarray(msg.x).ravel()))


def test_segmented_uniformity():
    cfg = Config(Nt=8, Na=2, Nr=4, Lin=2, Lh=1, mode="segmented",
                 alphabet="QPSK", trunc="trunc")
    msg = message.generate_message(jax.random.PRNGKey(2), cfg, 4096)
    ant = np.asarray(msg.ant).ravel()
    sym = np.asarray(msg.sym).ravel()
    for arr, card in ((ant, cfg.M), (sym, cfg.K)):
        freqs = np.bincount(arr, minlength=card) / arr.size
        assert np.all(np.abs(freqs - 1.0 / card) < 0.02)


def test_random_subset_uniformity():
    cfg = Config(Nt=8, Na=2, Nr=4, Lin=2, Lh=1, mode="random",
                 alphabet="OOK", trunc="trunc")
    msg = message.generate_message(jax.random.PRNGKey(3), cfg, 4096)
    ant = np.asarray(msg.ant).reshape(-1, cfg.Na)
    freqs = np.bincount(ant.ravel(), minlength=cfg.Nt) / ant.size
    assert np.all(np.abs(freqs - 1.0 / cfg.Nt) < 0.02)


def test_sparc_mode_uses_segmented():
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=5, Lh=2, mode="sparc",
                 alphabet="QPSK", trunc="tail")
    msg = message.generate_message(jax.random.PRNGKey(4), cfg, 3)
    seg = np.asarray(msg.x).reshape(3, cfg.L, cfg.M)
    assert np.all(np.count_nonzero(seg, axis=-1) == 1)
