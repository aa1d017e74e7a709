"""Fused Pallas BAMP iteration vs the XLA banded path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators


def _setup(trunc="tail", B=8, seed=0, snr_exp=1.5):
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=8, Lh=3, mode="segmented",
                 alphabet="QPSK", profile="uniform", trunc=trunc,
                 iterations=8)
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


def test_fused_requires_banded():
    cfg, op, y, s2 = _setup()
    with pytest.raises(ValueError):
        bamp.decode(op.densify(), y, s2, cfg, use_pallas=True)


def test_tile_picker():
    from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp import (
        _pick_tile)
    # flagship geometry: tile 32 is the largest that fits once Mosaic's
    # 128-lane padding of the Nr=24 y-side planes is accounted for (tile 64
    # was measured to OOM scoped VMEM on a real v5e: 18.5M vs the 14M cap)
    assert _pick_tile(2048, 2560, 528, 3, 24, 128) == 32
    # massive geometry: the x-side working set alone exceeds VMEM — the
    # lane-major kernel doesn't apply (banded XLA path covers it)
    assert _pick_tile(128, 43008, 2701, 6, 73, 1344) == 0
