"""Worker process for the multi-host (multi-process) smoke test.

Launched N times by tests/test_multihost.py (or manually) with:
    MH_COORD=localhost:<port> MH_NPROC=N MH_PID=<i> python scripts/multihost_worker.py

Each process contributes 4 virtual CPU devices; the global ``trials`` mesh
spans all processes, every process runs its local shard of the sharded
Monte-Carlo step, and the psum-reduced metric sums must agree across
processes — the distributed ``Loss.accumulate`` (SURVEY §2a) exercised
with a real multi-process runtime instead of a single-process fake.
"""
from __future__ import annotations

import json
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")



def main():
    coord = os.environ["MH_COORD"]
    nproc = int(os.environ["MH_NPROC"])
    pid = int(os.environ["MH_PID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import jax.numpy as jnp

    from amp_sparc_spatialmodulation_tpu.config import Config
    from amp_sparc_spatialmodulation_tpu.parallel import mesh as mesh_mod
    from amp_sparc_spatialmodulation_tpu.parallel import sweep as psweep

    devs = jax.devices()          # global device list across processes
    assert len(devs) == 4 * nproc, (len(devs), nproc)
    cfg = Config(Nt=16, Na=4, Nr=8, Lin=4, Lh=2, mode="segmented",
                 iterations=12, alphabet="OOK", profile="uniform",
                 trunc="tail")
    mesh = mesh_mod.make_mesh(trials=len(devs), model=1, devices=devs)
    res = 4
    step = psweep.make_sharded_step(cfg, "bamp", "sparc", res, mesh,
                                    operator_form="banded")
    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(len(devs))).reshape(len(devs), 1, 2)

    from jax.sharding import NamedSharding, PartitionSpec as P

    keys = jax.device_put(keys, NamedSharding(mesh, P("trials")))
    sums = step(keys, jnp.asarray(9.0, jnp.float32))
    out = {k: float(v) for k, v in sums.items()}
    print("MHRESULT " + json.dumps({"pid": pid, "trials": out["trials"],
                                    "fer": out["fer"], "T": out["T"]}),
          flush=True)


if __name__ == "__main__":
    main()
