"""Device mesh construction and (multi-host) runtime initialization.

The reference is single-process / single-device (SURVEY §2a: no
``torch.distributed`` anywhere); its only "parallelism" is the local batch
dimension.  Here parallelism is first-class:

* ``trials`` axis — data parallelism over Monte-Carlo trials / channel
  realizations (the dominant axis: trials are embarrassingly parallel and
  error-count reduction is one ``psum``).
* ``model`` axis — tensor parallelism over the measurement-operator columns,
  i.e. over channel uses of the frame.  Because the operator is
  block-banded in the channel-use dimension, this is simultaneously the
  sequence/context-parallel analog for this workload (SURVEY §2a/§5).

Within a slice the collectives ride ICI; across hosts ``jax.distributed``
lets the same mesh span processes with DCN only seeing the final
error-count psum.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

TRIALS_AXIS = "trials"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    Thin wrapper over ``jax.distributed.initialize``; on TPU pods the
    arguments are auto-detected from the environment.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(trials: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(trials, model)`` mesh over the available devices.

    Args:
        trials: size of the data-parallel axis; defaults to
            ``n_devices // model``.
        model: size of the tensor-parallel axis (1 = pure DP).
        devices: optional explicit device list.
    """
    devs = list(devices if devices is not None else jax.devices())
    if trials is None:
        trials = len(devs) // model
    n = trials * model
    if n > len(devs):
        raise ValueError(f"mesh {trials}x{model} needs {n} devices, "
                         f"have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(trials, model)
    return Mesh(arr, (TRIALS_AXIS, MODEL_AXIS))
