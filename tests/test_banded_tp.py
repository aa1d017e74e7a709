"""Halo-exchange sequence-parallel BAMP (parallel/banded.py) must equal the
single-device banded decode exactly (same trajectory, same per-trial T) on
all three truncation geometries, in complex and real mode, and inside the
sharded sweep step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp, montecarlo
from amp_sparc_spatialmodulation_tpu.ops import channel, message, operators
from amp_sparc_spatialmodulation_tpu.parallel import banded
from amp_sparc_spatialmodulation_tpu.parallel import mesh as mesh_mod
from amp_sparc_spatialmodulation_tpu.parallel import sweep as psweep


def _cfg(**kw):
    base = dict(Nt=16, Na=4, Nr=8, Lin=4, Lh=2, mode="segmented",
                iterations=20, alphabet="OOK", profile="uniform",
                trunc="tail")
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _halo_vs_single(cfg, k, devices, seed=3, B=3, snr_db=8.0):
    """Run the halo decode on a model=k mesh and the single-device banded
    decode on identical (taps, y); return both results."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.mode == "sparc" or True:   # published sweeps use the SPARC matrix
        W = channel.base_matrix(cfg)
        h = channel.sample_sparc_taps(k1, cfg)
        gains = jnp.asarray(operators.sparc_gains(cfg, W))
    msg = message.generate_message(k2, cfg, B)
    op = operators.BandedOperator(h=h, gains=gains, Lin=cfg.Lin,
                                  Lout=cfg.Lout, trunc=cfg.trunc)
    snr = 10 ** (snr_db / 10)
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, B)
    sigma2 = cfg.sigma2(snr)

    ref = bamp.decode(op, y, sigma2, cfg)

    m = mesh_mod.make_mesh(trials=1, model=k, devices=devices[:k])

    def run(h_, gains_, y_):
        y_local = banded.shard_rows(y_, cfg)
        xmap_k, xmmse_k, var_k, T = banded.decode(h_, gains_, y_local,
                                                  sigma2, cfg)
        return (banded.gather_columns(xmap_k),
                banded.gather_columns(xmmse_k),
                banded.gather_columns(var_k), T)

    sharded = jax.jit(jax.shard_map(run, mesh=m, in_specs=(P(), P(), P()),
                                    out_specs=(P(), P(), P(), P()),
                                    check_vma=False))
    xmap, xmmse, var, T = sharded(h, gains, y)
    return ref, (xmap, xmmse, var, T)


@pytest.mark.parametrize("trunc", ["tail", "cyclic", "trunc"])
@pytest.mark.parametrize("k", [2, 4])
def test_halo_decode_matches_single_device(eight_devices, trunc, k):
    cfg = _cfg(trunc=trunc)
    ref, (xmap, xmmse, var, T) = _halo_vs_single(cfg, k, eight_devices)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref.var),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(xmap), np.asarray(ref.xmap),
                               atol=2e-3)


@pytest.mark.parametrize("trunc", ["tail", "cyclic"])
def test_halo_decode_multi_hop(eight_devices, trunc):
    """Halo wider than the local block count: Lh-1=3 > LinL=1 at k=4 —
    contributions travel 3 shards via the multi-hop exchange."""
    cfg = _cfg(Lin=4, Lh=4, trunc=trunc)
    ref, (xmap, xmmse, var, T) = _halo_vs_single(cfg, 4, eight_devices)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)


def _halo_scamp_vs_single(cfg, k, devices, seed=3, B=3, snr_db=9.0,
                          estimate_phi=False):
    from amp_sparc_spatialmodulation_tpu.models import scamp
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    W = channel.base_matrix(cfg)
    h = channel.sample_sparc_taps(k1, cfg)
    gains = jnp.asarray(operators.sparc_gains(cfg, W))
    msg = message.generate_message(k2, cfg, B)
    op = operators.BandedOperator(h=h, gains=gains, Lin=cfg.Lin,
                                  Lout=cfg.Lout, trunc=cfg.trunc)
    snr = 10 ** (snr_db / 10)
    y = op.apply(msg.x) + channel.awgn(k3, cfg, snr, B)
    sigma2 = cfg.sigma2(snr)
    Wj = jnp.asarray(W)

    ref = scamp.decode(Wj, op, y, sigma2, cfg, estimate_phi=estimate_phi)

    m = mesh_mod.make_mesh(trials=1, model=k, devices=devices[:k])

    def run(h_, gains_, W_, y_):
        y_local = banded.shard_rows(y_, cfg)
        xmap_k, xmmse_k, var_k, T = banded.scamp_decode(
            h_, gains_, W_, y_local, sigma2, cfg,
            estimate_phi=estimate_phi)
        return (banded.gather_columns(xmap_k),
                banded.gather_columns(xmmse_k), T)

    sharded = jax.jit(jax.shard_map(run, mesh=m,
                                    in_specs=(P(), P(), P(), P()),
                                    out_specs=(P(), P(), P()),
                                    check_vma=False))
    xmap, xmmse, T = sharded(h, gains, Wj, y)
    return ref, (xmap, xmmse, T)


@pytest.mark.parametrize("trunc", ["tail", "cyclic", "trunc"])
@pytest.mark.parametrize("k", [2, 4])
def test_halo_scamp_matches_single_device(eight_devices, trunc, k):
    cfg = _cfg(mode="sparc", trunc=trunc)
    ref, (xmap, xmmse, T) = _halo_scamp_vs_single(cfg, k, eight_devices)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(xmap), np.asarray(ref.xmap),
                               atol=2e-3)


def test_halo_scamp_estimate_phi(eight_devices):
    """estSCAMP's empirical residual variance (`sparc.py:199`) under the
    halo decode: per-block |z|^2 means psum-assembled across shards."""
    cfg = _cfg(mode="sparc")
    ref, (xmap, xmmse, T) = _halo_scamp_vs_single(cfg, 4, eight_devices,
                                                  estimate_phi=True)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)


@pytest.mark.parametrize("k", [2, 4, 8])
def test_halo_scamp_massive_config(eight_devices, k):
    """The massive-MIMO Nt=1344 config decodes model-parallel across
    2/4/8 shards exactly (k=8 gives LinL=4 < Lh-1=5 — multi-hop halo)."""
    cfg = Config(Nt=1344, Na=84, Nr=73, Lin=32, Lh=6, mode="sparc",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=5)
    ref, (xmap, xmmse, T) = _halo_scamp_vs_single(cfg, k, eight_devices,
                                                  B=2, snr_db=10.0)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)


def test_scamp_tp_sharded_sweep_step(eight_devices):
    """SCAMP through make_sharded_step on a (trials x model) mesh."""
    cfg = _cfg(mode="sparc")
    m = mesh_mod.make_mesh(trials=2, model=2, devices=eight_devices[:4])
    step = psweep.make_sharded_step(cfg, "scamp", "sparc", res=4, mesh=m)
    base = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(2)).reshape(2, 1, 2)
    out = {k: float(v) for k, v in
           step(keys, jnp.asarray(9.0, jnp.float32)).items()}
    assert out["trials"] == 2 * 4
    assert out["T"] >= out["trials"]  # at least one iteration per trial


def test_halo_decode_matches_single_device_real_mode(eight_devices):
    # 14 dB: all trials converge decisively (at 8 dB this config sits on a
    # convergence knife-edge where fp32 summation-order noise flips T).
    cfg = _cfg(is_complex=False, Lh=3, Lin=6, Nr=10, iterations=40)
    ref, (xmap, xmmse, var, T) = _halo_vs_single(cfg, 2, eight_devices,
                                                 snr_db=14.0)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)


def test_halo_decode_wide_halo(eight_devices):
    """Lh-1 == LinL (halo exactly one full shard): trajectories match up
    to borderline 1e-5-allclose stops — the single-device baseline's
    shift-accumulate became static slice-adds in round 5 (different XLA
    fusion, different f32 rounding), which can flip a knife-edge trial
    by one iteration (same class as dense-vs-banded; BASELINE.md)."""
    cfg = _cfg(Lh=3, Lin=8)                    # k=4 -> LinL=2 == Lh-1
    ref, (xmap, xmmse, var, T) = _halo_vs_single(cfg, 4, eight_devices)
    dT = np.abs(np.asarray(T) - np.asarray(ref.T))
    assert dT.max() <= 1 and (dT == 0).mean() >= 0.6, (T, ref.T)
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)


def test_halo_oversharded_frame_decodes(eight_devices):
    """Halo wider than the local block count (k=4 -> LinL=2 < Lh-1=3) —
    previously rejected, now handled by the multi-hop exchange."""
    cfg = _cfg(Lh=4, Lin=8)
    ref, (xmap, xmmse, var, T) = _halo_vs_single(cfg, 4, eight_devices)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)


def test_halo_decode_massive_mimo_config(eight_devices):
    """The Nt=1344 massive-MIMO config — whose 0.93 GB dense operator the
    dense column-TP cannot build — decodes under halo sequence parallelism
    and matches the single-device banded decode."""
    import dataclasses

    from amp_sparc_spatialmodulation_tpu.config import massive_mimo

    cfg = dataclasses.replace(massive_mimo(), iterations=6)
    ref, (xmap, xmmse, var, T) = _halo_vs_single(cfg, 4, eight_devices,
                                                 B=2, snr_db=22.0)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=5e-4)


def test_tp_sharded_sweep_uses_banded_and_matches_serial(eight_devices):
    """trials x model sharded step on the halo path reproduces the serial
    single-device banded sums with the same keys."""
    cfg = _cfg()
    res = 4
    m = mesh_mod.make_mesh(trials=2, model=2, devices=eight_devices[:4])
    step = psweep.make_sharded_step(cfg, "bamp", "sparc", res, m,
                                    operator_form="banded")
    base = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(2)).reshape(2, 1, 2)
    snr = jnp.asarray(7.0, jnp.float32)
    sharded = {k: float(v) for k, v in step(keys, snr).items()}

    fn = montecarlo.make_realization_fn(cfg, "bamp", "sparc", res,
                                        operator_form="banded")
    total = None
    for i in range(2):
        sums = {k: float(v) for k, v in fn(jax.random.fold_in(base, i),
                                           snr).items()}
        total = sums if total is None else {k: total[k] + sums[k]
                                            for k in sums}
    assert sharded["trials"] == total["trials"] == 2 * res
    for k in sharded:
        assert sharded[k] == pytest.approx(total[k], rel=1e-4, abs=1e-3), k
