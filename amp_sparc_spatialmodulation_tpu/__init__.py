"""TPU-native AMP/SPARC spatial-modulation receiver framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
PyTorch reference simulator ``AhmedKishki/AMP-SPARC-SpatialModulation``:
Monte-Carlo simulation of sparse-recovery receivers (BAMP / VAMP / SCAMP)
for spatial-modulation MIMO over frequency-selective Rayleigh channels,
with hard-decision FER/SER/BER/NMSE evaluation, per-SNR JSON artifacts,
waterfall plotting, and capacity analysis — batched, jitted, and sharded
over TPU meshes.
"""
from . import config as _config
from .config import Config  # noqa: F401

__version__ = "0.2.0"
