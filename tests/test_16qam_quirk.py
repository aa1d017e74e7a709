"""The reference 16QAM table duplicates `-1+3j` (`config.py:112`): a
transmitted duplicate decodes to the same VALUE (no frame error) but a
different GRAY label (a counted symbol error) — `loss.py` semantics."""
import jax.numpy as jnp
import numpy as np

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.ops.message import Message
from amp_sparc_spatialmodulation_tpu.utils import metrics


def test_duplicate_symbol_value_match_gray_mismatch():
    cfg = Config(Nt=8, Na=2, Nr=4, Lin=2, Lh=1, mode="segmented",
                 alphabet="16QAM", trunc="trunc")
    symbols = np.asarray(cfg.symbols)
    dup = [i for i in range(cfg.K)
           for j in range(i) if abs(symbols[i] - symbols[j]) < 1e-9]
    assert dup, "reference table should contain a duplicate"
    second = dup[0]                      # later duplicate index
    first = next(j for j in range(second)
                 if abs(symbols[second] - symbols[j]) < 1e-9)

    B, L, M = 1, cfg.L, cfg.M
    ant = np.zeros((B, L), np.int32)
    sym = np.full((B, L), second, np.int32)     # transmit the LATER index
    x = np.zeros((B, L, M), complex)
    x[:, :, 0] = symbols[second]
    base = (np.arange(B)[:, None] * L + np.arange(L)) * M
    msg = Message(x=jnp.asarray(x.reshape(B, -1), jnp.complex64),
                  ant=jnp.asarray(ant), sym=jnp.asarray(sym),
                  gray=jnp.asarray(np.asarray(cfg.gray)[sym]),
                  flat=jnp.asarray(base + ant, jnp.int32))
    # noiseless decision statistic = x itself
    sums = metrics.evaluate_sums(msg.x, msg.x, msg,
                                 jnp.ones((B,), jnp.int32), cfg)
    fin = metrics.finalize({k: float(v) for k, v in sums.items()}, cfg)
    # values identical -> no frame/vector errors
    assert fin["fer"] == 0.0 and fin["ver"] == 0.0
    # decision picks the FIRST duplicate -> gray mismatch counted as ser
    dec = metrics.segmented_decision(msg.x, cfg)
    assert np.all(np.asarray(dec.gray) == cfg.gray[first])
    assert fin["ser"] == 1.0

    # with the repaired table there is no duplicate at all
    fixed = cfg.replace(fix_16qam=True)
    sf = np.asarray(fixed.symbols)
    assert len({complex(round(v.real, 6), round(v.imag, 6)) for v in sf}) \
        == 16
