"""Fused Pallas BAMP iteration vs the XLA banded path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators


def _setup(trunc="tail", B=8, seed=0, snr_exp=1.5, alphabet="QPSK",
           iterations=8):
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="segmented",
                 alphabet=alphabet, profile="uniform", trunc=trunc,
                 iterations=iterations)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    W, op = operators.banded_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** snr_exp
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, B)
    return cfg, op, y, cfg.sigma2(snr)


@pytest.mark.parametrize("trunc", ["tail", "trunc", "cyclic"])
def test_fused_matches_xla(trunc):
    cfg, op, y, s2 = _setup(trunc=trunc)
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


@pytest.mark.parametrize("trunc", ["tail", "trunc", "cyclic"])
def test_fully_fused_ook_matches_xla(trunc):
    """OOK (K=1) activates the whole-iteration kernel with the in-kernel
    segmented denoiser; the trajectory must match the XLA path."""
    cfg, op, y, s2 = _setup(trunc=trunc, alphabet="OOK", snr_exp=1.2,
                            iterations=12)
    assert cfg.K == 1
    r_x = bamp.decode(op, y, s2, cfg)
    r_p = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.T), np.asarray(r_p.T))
    assert float(jnp.max(jnp.abs(r_x.xmap - r_p.xmap))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.xmmse - r_p.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(r_x.var - r_p.var))) < 1e-4


def test_fused_denoiser_flag_selected():
    """The fused-denoiser kernel engages exactly for K=1 power-of-two M."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        FusedBandedIteration)
    cfg, op, y, s2 = _setup(alphabet="OOK")
    f = FusedBandedIteration(op, 8, interpret=True, fuse_denoiser=True,
                             symbols=cfg.symbols, M=cfg.M)
    assert f.fuse_denoiser
    with pytest.raises(ValueError):
        FusedBandedIteration(op, 8, interpret=True, fuse_denoiser=True,
                             symbols=[1.0, -1.0], M=cfg.M)
    with pytest.raises(ValueError):
        FusedBandedIteration(op, 8, interpret=True, fuse_denoiser=True,
                             symbols=cfg.symbols, M=3)


def test_fused_requires_banded():
    cfg, op, y, s2 = _setup()
    with pytest.raises(ValueError):
        bamp.decode(op.densify(), y, s2, cfg, use_pallas=True)


def test_pallas_tile_override_validation(monkeypatch):
    """PALLAS_TILE bypasses the VMEM budget (the experiment knob) but never
    the hard layout constraints, and it must announce itself."""
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        _pick_tile)
    monkeypatch.setenv("PALLAS_TILE", "12")   # not a multiple of 8
    with pytest.raises(ValueError):
        _pick_tile(96, 6, 9, 20, 22, 128, 24)
    monkeypatch.setenv("PALLAS_TILE", "64")   # doesn't divide B
    with pytest.raises(ValueError):
        _pick_tile(96, 6, 9, 20, 22, 128, 24)
    monkeypatch.setenv("PALLAS_TILE", "16")
    with pytest.warns(UserWarning):
        assert _pick_tile(96, 6, 9, 20, 22, 128, 24) == 16


def test_tile_picker():
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        _pick_tile)
    # flagship geometry: tile 32 is the largest that fits once Mosaic's
    # 128-lane padding of the Nr=24 y-side planes is accounted for (tile 64
    # was measured to OOM scoped VMEM on a real v5e: 18.5M vs the 14M cap)
    assert _pick_tile(2048, 6, 9, 20, 22, 128, 24) == 32
    # massive geometry: the x-side working set alone exceeds VMEM — the
    # lane-major kernel doesn't apply (banded XLA path covers it)
    assert _pick_tile(128, 6, 9, 32, 37, 1344, 73) == 0
