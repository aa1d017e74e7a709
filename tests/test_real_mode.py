"""Real-valued channel mode (is_complex=False, `channel.py:33-38`):
end-to-end decode with real dtypes and a decaying waterfall."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models.montecarlo import (Simulator,
                                                               make_realization_fn)
from amp_sparc_spatialmodulation_tpu.ops import channel, message


def _cfg(alph="OOK"):
    return Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                  alphabet=alph, profile="uniform", trunc="tail",
                  iterations=40, is_complex=False)


def test_real_channel_and_message_dtypes():
    cfg = _cfg("BPSK")
    k = jax.random.PRNGKey(0)
    H = channel.generate_channel(k, cfg)
    assert H.dtype == jnp.float32
    msg = message.generate_message(k, cfg, 4)
    assert not jnp.iscomplexobj(msg.x)
    w = channel.awgn(k, cfg, 4.0, 8)
    assert w.dtype == jnp.float32
    # total noise variance convention unchanged (`channel.py:115`)
    w2 = channel.awgn(k, cfg, 4.0, 2048)
    assert float(jnp.mean(jnp.abs(w2) ** 2)) == pytest.approx(
        cfg.Na / cfg.Nr / 4.0, rel=0.1)


@pytest.mark.parametrize("alph", ["OOK", "BPSK"])
def test_real_mode_waterfall_decays(tmp_path, alph):
    cfg = _cfg(alph)
    sim = Simulator(cfg, algo="bamp", out_root=str(tmp_path))
    lo = sim.run_point(8.0, epochs=64, res=32, snr_idx=0)
    hi = sim.run_point(16.0, epochs=64, res=32, snr_idx=1)
    assert hi["fer"] <= lo["fer"]
    assert np.isfinite(hi["nMSE"]) and hi["nMSE"] < lo["nMSE"] + 1e-9


def test_real_mode_scamp_runs():
    cfg = _cfg("OOK").replace(mode="sparc")
    fn = make_realization_fn(cfg, "scamp", "sparc", res=8)
    sums = fn(jax.random.PRNGKey(1), jnp.asarray(30.0, jnp.float32))
    assert float(sums["trials"]) == 8
