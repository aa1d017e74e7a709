"""Frame-tiled per-iteration BAMP kernel (massive-MIMO path) vs the XLA
banded decode — interpret mode on CPU; Mosaic compiles the same kernel
on TPU (scripts/bench_massive.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp
from amp_sparc_spatialmodulation_tpu.models.bamp import _fused_plane_loop
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators
from amp_sparc_spatialmodulation_tpu.ops.pallas.fused_bamp_tiled import (
    TiledBandedIteration)


def _setup(Lin=8, Lh=3, B=16, snr_exp=0.8, seed=0):
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=Lin, Lh=Lh, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=30)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    _, op = operators.banded_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** snr_exp
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, B)
    return cfg, op, y, cfg.sigma2(snr)


@pytest.mark.parametrize("Lin,Lh,F", [(8, 3, 4), (8, 3, 8), (12, 5, 4)])
def test_tiled_iteration_matches_xla(Lin, Lh, F):
    """Per-trial T must be EXACT vs the XLA banded path; values within
    f32 accumulation noise.  Covers multi-tile frames (the halo/edge
    logic), a frame-sized tile (n_xt=1: both edges zeroed), and a
    halo that spans the whole tile (F = Lh - 1)."""
    cfg, op, y, s2 = _setup(Lin=Lin, Lh=Lh)
    B = y.shape[0]
    ref = bamp.decode(op, y, s2, cfg)
    tiled = TiledBandedIteration(op, B, interpret=True,
                                 symbols=cfg.symbols, M=cfg.M, F=F,
                                 tile=8)
    N, n = cfg.Lin * cfg.Nt, cfg.Lout * cfg.Nr
    s0 = bamp.BAMPState(
        xmap=jnp.zeros((B, N), y.dtype), xmmse=jnp.zeros((B, N), y.dtype),
        var=jnp.ones((B, N), jnp.float32), z=y,
        u=jnp.full((B, n), float(s2), jnp.float32),
        active=jnp.ones((B,), bool), T=jnp.zeros((B,), jnp.int32),
        t=jnp.zeros((), jnp.int32))
    st = _fused_plane_loop(tiled, s0, y, jnp.float32(s2), cfg.N_Layers)
    # The tiled fold's f32 accumulation order differs from the XLA
    # banded path, so borderline 1e-5-allclose stops can flip by one
    # iteration on a few trials (same class of difference as
    # dense-vs-banded XLA; BASELINE.md).  Require near-total exactness
    # and tight values.
    dT = np.abs(np.asarray(ref.T) - np.asarray(st.T))
    assert dT.max() <= 1 and (dT == 0).mean() >= 0.9, dT
    assert float(jnp.max(jnp.abs(st.xmmse - ref.xmmse))) < 1e-4
    assert float(jnp.max(jnp.abs(st.var - ref.var))) < 1e-4


def test_tiled_covers_and_decode_integration(monkeypatch):
    """bamp.decode falls through whole-kernel -> per-iter -> TILED for
    geometries that fit none of the whole-frame tiles, and 'auto'
    resolution agrees; complex alphabets stay uncovered."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import (
        resolve_use_pallas)
    cfg, op, y, s2 = _setup()
    assert TiledBandedIteration.covers(cfg, 16)
    qpsk = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                  alphabet="QPSK", profile="uniform", trunc="tail",
                  iterations=30)
    assert not TiledBandedIteration.covers(qpsk, 16)
    # force the whole/per-iter kernels to decline -> decode uses tiled
    from amp_sparc_spatialmodulation_tpu.ops.pallas import fused_bamp
    monkeypatch.setattr(fused_bamp, "_pick_tile",
                        lambda *a, **k: 0)
    ref = bamp.decode(op, y, s2, cfg)
    out = bamp.decode(op, y, s2, cfg, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ref.T), np.asarray(out.T))
    assert float(jnp.max(jnp.abs(out.xmmse - ref.xmmse))) < 1e-5


def test_tiled_two_phase_composes(monkeypatch, tmp_path):
    """Continuation batching must compose with the frame-tiled kernel
    (resumable per-iteration loop): with the whole-frame kernels forced
    to decline, the two-phase simulator on the tiled path must match
    the single-phase XLA decode statistics."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator
    from amp_sparc_spatialmodulation_tpu.ops.pallas import fused_bamp
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=8, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=30)
    ref = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "a")
                    ).run_point(7.0, epochs=128, res=32)
    monkeypatch.setattr(fused_bamp, "_pick_tile", lambda *a, **k: 0)
    out = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "b"),
                    two_phase=6, use_pallas=True
                    ).run_point(7.0, epochs=128, res=32)
    # tiled fold order differs from XLA -> borderline allclose flips
    assert out["T"] == pytest.approx(ref["T"], abs=0.5)
    for k, v in ref.items():
        if k == "T":
            continue
        assert out[k] == pytest.approx(v, rel=1e-3, abs=1e-9), k
