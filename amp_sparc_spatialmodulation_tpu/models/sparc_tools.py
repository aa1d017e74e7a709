"""SPARC coding tools: nat-rate math, power allocation, power-allocated
base matrices, and single-trial experiments.

Capability parity with the reference's standalone NumPy twin
(``/root/reference/sparc.py``), which carries features the torch pipeline
lacks: SPARC rate math in nats (`sparc.py:15-24`), exponentially-decaying
power allocation (`sparc.py:94-104`), base matrices with per-column power
weighting (`sparc.py:67-84`), and single-trial end-to-end runs comparing
SCAMP vs BAMP (`sparc.py:316-331,453-474`).  The empirical-residual
``estSCAMP`` variant (`sparc.py:180-204`) lives in
:func:`..models.scamp.decode` as ``estimate_phi=True``.

Conventions follow the twin, not ``channel.py``: the base matrix is
normalized so its MEAN IS ~1 (signal power), taps are ``CN(0, 1/Lt)``, and
rates are in nats.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import channel as channel_ops
from ..ops import message as message_ops
from . import bamp as bamp_mod
from . import scamp as scamp_mod


def sparc_rate_nats(Nt: int, K: int, Lt: int, Lh: int, Nr: int) -> float:
    """Inner SPARC rate in nats (`sparc.py:19`)."""
    n = (Lt + Lh - 1) * Nr
    return Lt * float(np.log(Nt * K)) / n


def segmented_sparc_rate_nats(Nt: int, Na: int, Nr: int, Lt: int,
                              Lh: int, K: int) -> float:
    """Na-active segmented SPARC rate in nats (`sparc.py:351`)."""
    n = (Lt + Lh - 1) * Nr
    return Lt * Na * float(np.log(Nt * K / Na)) / n


def ebn0_min_db(rate: float) -> float:
    """Shannon-limit Eb/N0 for a rate (`sparc.py:21`)."""
    return 10.0 * float(np.log10((2.0 ** rate - 1.0) / rate))


def exp_power_allocation(snr: float, Lt: int, f: Optional[float] = None,
                         a: Optional[float] = None) -> np.ndarray:
    """Exponentially-decaying power allocation (`sparc.py:94-104`).

    With no (f, a): ``P_l ~ 2^(-2C l / Lt)``.  With ``0 < f < 1`` and
    ``a``: decay at slope ``a`` up to section ``f*Lt``, flat afterwards.
    """
    C = float(np.log(1.0 + snr))
    if f is None and a is None:
        return np.array([2.0 ** (-2.0 * C * l / Lt) for l in range(Lt)])
    if f is not None and 0.0 < f < 1.0 and a is not None:
        cut = int(f * Lt)
        pa1 = np.array([2.0 ** (-2.0 * a * C * l / Lt) for l in range(cut)])
        pa2 = np.full(Lt - cut, 2.0 ** (-2.0 * a * C * f))
        return np.concatenate([pa1, pa2])
    raise ValueError("need either no (f, a) or 0<f<1 with a set")


def base_matrix_pa(Lt: int, Lh: int, pdp: np.ndarray,
                   power_allocation: Optional[np.ndarray] = None
                   ) -> np.ndarray:
    """Power-allocated base matrix, mean ~ signal power = 1
    (`sparc.py:67-84`)."""
    Lr = Lt + Lh - 1
    if power_allocation is None:
        power_allocation = np.ones(Lt)
    W = np.zeros((Lr, Lt))
    for l in range(Lh):
        W += np.eye(Lr, Lt, -l) * pdp[l] * Lr / Lh
    return W * power_allocation / power_allocation.mean()


class SingleTrialResult(NamedTuple):
    ser: float            # section error rate
    fer: float
    nmse: float
    C: float              # AWGN capacity bits
    rate: float           # nat rate


def _section_errors(xhat, x, L, M):
    seg_hat = np.asarray(xhat).reshape(L, M)
    seg = np.asarray(x).reshape(L, M)
    errs = (np.abs(seg_hat - seg) > 1e-6).any(axis=-1)
    return float(errs.mean()), float(errs.any())


def _build_trial(cfg: Config, ebn0_db: float,
                 power_allocation: Optional[np.ndarray], seed: int):
    """One (message, power-allocated channel, noise) draw shared by the
    single-trial experiments.

    Uses the framework decoders on the twin's normalization: symbols stay
    unit power, the base matrix mean is renormalized to ``Na/Nr`` so the
    decoders' ``sigma2 = (Na/Nr)/SNR`` convention applies unchanged.
    """
    from ..ops import operators

    rate = segmented_sparc_rate_nats(cfg.Nt, cfg.Na, cfg.Nr, cfg.Lin,
                                     cfg.Lh, cfg.K)
    snr_db = ebn0_db + 10 * np.log10(rate)
    snr = 10 ** (snr_db / 10)
    W = base_matrix_pa(cfg.Lin, cfg.Lh, cfg.pdp, power_allocation)
    # renormalize to the decoder convention (mean = Na/Nr, `channel.py:83`)
    W = (W / W.mean() * cfg.Na / cfg.Nr).astype(np.float32)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    h = channel_ops.sample_sparc_taps(k1, cfg)
    op = operators.BandedOperator(h=h, gains=jnp.asarray(
        operators.sparc_gains(cfg, W)), Lin=cfg.Lin, Lout=cfg.Lout,
        trunc=cfg.trunc)
    msg = message_ops.generate_message(k2, cfg, 1)
    y = op.apply(msg.x) + channel_ops.awgn(k3, cfg, snr, 1)
    return W, op, msg, y, cfg.sigma2(snr), snr, rate


def _eval_trial(out, msg, cfg: Config, snr: float,
                rate: float) -> SingleTrialResult:
    from ..utils import metrics

    dec = metrics.decide(out.xmap, cfg)
    ser, fer = _section_errors(dec.xhat[0], msg.x[0], cfg.Lin, cfg.Nt)
    nmse = float(jnp.mean(jnp.abs(out.xmmse - msg.x) ** 2))
    return SingleTrialResult(ser=ser, fer=fer, nmse=nmse,
                             C=float(np.log2(1 + snr)), rate=rate)


def run_single_trial(cfg: Config, ebn0_db: float, algo: str = "scamp",
                     power_allocation: Optional[np.ndarray] = None,
                     estimate_phi: bool = False, seed: int = 0
                     ) -> SingleTrialResult:
    """Single-trial end-to-end SPARC experiment (`sparc.py:316-331`):
    draw message + power-allocated channel, decode, hard-decide, report
    section/frame error rates and NMSE.
    """
    W, op, msg, y, sigma2, snr, rate = _build_trial(cfg, ebn0_db,
                                                    power_allocation, seed)
    if algo == "scamp":
        out = scamp_mod.decode(jnp.asarray(W), op, y, sigma2, cfg,
                               estimate_phi=estimate_phi)
    elif algo == "bamp":
        out = bamp_mod.decode(op, y, sigma2, cfg)
    else:
        raise ValueError(f"unknown algo {algo!r}")
    return _eval_trial(out, msg, cfg, snr, rate)


def compare_single_trial(cfg: Config, ebn0_db: float,
                         power_allocation: Optional[np.ndarray] = None,
                         estimate_phi: bool = False, seed: int = 0
                         ) -> dict:
    """Decode the SAME (message, channel, noise) draw with SCAMP and BAMP
    and report both — the reference twin's head-to-head comparison
    (`sparc.py:453-474`, SPARC2.run prints SCAMP and BAMP error rates for
    one shared draw)."""
    W, op, msg, y, sigma2, snr, rate = _build_trial(cfg, ebn0_db,
                                                    power_allocation, seed)
    out_s = scamp_mod.decode(jnp.asarray(W), op, y, sigma2, cfg,
                             estimate_phi=estimate_phi)
    out_b = bamp_mod.decode(op, y, sigma2, cfg)
    return {"scamp": _eval_trial(out_s, msg, cfg, snr, rate),
            "bamp": _eval_trial(out_b, msg, cfg, snr, rate)}
