"""End-to-end decode across every alphabet the reference supports.

The reference's alphabet tables (`config.py:78-115`) cover OOK, BPSK,
4ASK, QPSK, 8PSK, 16PSK, 16QAM; published sweeps only exercise OOK, BPSK,
QPSK and 8PSK.  Here every alphabet runs end-to-end (channel -> message
-> BAMP -> hard decision) through the full Config -> metrics pipeline.

Two documented reference behaviors are pinned:

* **4ASK / 16QAM in segmented mode do not decode** — the segmented
  denoiser (`bamp.py:69`) computes the posterior from ``Re(r conj(s))/tau``
  only, omitting the ``-|s|^2/(2 tau)`` term, which is a valid likelihood
  only for constant-modulus alphabets.  Verified against the reference
  itself: torch BAMP on the same tiny system at 14-18 dB yields NMSE ~1.0
  or NaN with T pinned at the cap for 4ASK/16QAM, while OOK/QPSK decode to
  NMSE ~0 in ~5 iterations.  We reproduce the limitation (uncalibrated
  posterior) but stay finite — our softmax is stabilized per segment, not
  by the reference's global max (`bamp.py:70`), which NaNs at high SNR.
* **16QAM in random mode hits the duplicated-symbol floor** — the
  reference table lists ``-1+3j`` twice and lacks ``3-3j``
  (`config.py:112`), so 1/16 of drawn labels are undecodable; with
  ``fix_16qam=True`` the floor disappears.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp
from amp_sparc_spatialmodulation_tpu.ops import channel, message
from amp_sparc_spatialmodulation_tpu.utils import metrics

CONSTANT_MODULUS = ["OOK", "BPSK", "QPSK", "8PSK", "16PSK"]
MULTI_MODULUS = ["4ASK", "16QAM"]


def _run(alphabet: str, mode: str, snr_db: float, seed: int = 0,
         fix_16qam: bool = False):
    cfg = Config(Nt=16, Na=4, Nr=12, Lin=8, Lh=3, mode=mode,
                 iterations=60, alphabet=alphabet, profile="uniform",
                 trunc="tail", fix_16qam=fix_16qam)
    B = 8
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10 ** (snr_db / 10)
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    res = bamp.decode(A, y, cfg.E / snr, cfg)
    sums = metrics.evaluate_sums(res.xmap, res.xmmse, msg, res.T, cfg)
    return metrics.finalize(sums, cfg)


@pytest.mark.parametrize("alphabet", CONSTANT_MODULUS)
def test_segmented_decodes_clean(alphabet):
    # Dense constellations need more SNR; thresholds are loose — the test
    # asserts the pipeline works per alphabet, not an operating point.
    snr_db = {"16PSK": 26.0, "8PSK": 22.0}.get(alphabet, 16.0)
    out = _run(alphabet, "segmented", snr_db)
    assert out["ser"] <= 0.05, (alphabet, out["ser"])
    assert out["ier"] <= 0.05, (alphabet, out["ier"])
    assert np.isfinite(out["nMSE"])


@pytest.mark.parametrize("alphabet", MULTI_MODULUS)
def test_segmented_multi_modulus_reference_limitation(alphabet):
    """Pins the reference's segmented-denoiser limitation (docstring above):
    the decode must run the full pipeline and stay FINITE (the reference
    NaNs), but does not reach a low error rate at any SNR."""
    out = _run(alphabet, "segmented", 18.0)
    for k, v in out.items():
        assert np.isfinite(v), (alphabet, k, v)
    assert out["ser"] > 0.05, "limitation gone — update docs + reference cite"


@pytest.mark.parametrize("alphabet", ["BPSK", "QPSK"])
def test_random_mode_decodes_clean(alphabet):
    out = _run(alphabet, "random", 18.0)
    assert out["ser"] <= 0.05, (alphabet, out["ser"])


def test_random_mode_16qam_duplicate_floor_and_fix():
    """The i.i.d. mixture denoiser handles multi-modulus alphabets (its
    Gaussian includes the full |r-s|^2, `bamp.py:93`), so random-mode 16QAM
    decodes up to the duplicated-symbol floor; fix_16qam removes it."""
    quirky = _run("16QAM", "random", 26.0)
    assert quirky["ier"] <= 0.02, quirky["ier"]          # indices decode
    assert 0.03 <= quirky["ser"] <= 0.25, quirky["ser"]  # duplicate floor
    fixed = _run("16QAM", "random", 26.0, fix_16qam=True)
    assert fixed["ser"] <= 0.02, fixed["ser"]


def test_real_alphabets_real_mode():
    """Real alphabets (BPSK) with ``is_complex=False``: the whole pipeline
    must produce real dtypes and still decode (`loss.py:30-35` branch)."""
    cfg = Config(Nt=16, Na=4, Nr=12, Lin=8, Lh=3, mode="segmented",
                 iterations=60, alphabet="BPSK", profile="uniform",
                 trunc="tail", is_complex=False)
    assert not cfg.is_complex
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    assert not jnp.iscomplexobj(A)
    msg = message.generate_message(k2, cfg, 4)
    assert not jnp.iscomplexobj(msg.x)
    snr = 10 ** (16.0 / 10)
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, 4)
    res = bamp.decode(A, y, cfg.E / snr, cfg)
    assert not jnp.iscomplexobj(res.xmmse)
