"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
DP psum reduction equals single-device sums; TP column-sharded BAMP equals
the dense single-device decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models import bamp, montecarlo
from amp_sparc_spatialmodulation_tpu.ops import channel, message
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


def test_dp_sharded_vamp_use_pallas(eight_devices):
    """The sharded DP path composes with the fused whole-decode VAMP
    kernel (interpret mode on CPU): same statistics as the serial XLA
    SV-domain decode."""
    cfg = _cfg(Lin=8, Lh=3, iterations=15)
    res = 8
    m = mesh_mod.make_mesh(trials=4, model=1, devices=eight_devices[:4])
    step = psweep.make_sharded_step(cfg, "vamp", "sparc", res, m,
                                    operator_form="dense",
                                    use_pallas=True)
    base = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(4)).reshape(4, 1, 2)
    snr = jnp.asarray(7.0, jnp.float32)
    sharded = {k: float(v) for k, v in step(keys, snr).items()}

    fn = montecarlo.make_realization_fn(cfg, "vamp", "sparc", res,
                                        operator_form="dense")
    total = None
    for i in range(4):
        sums = fn(jax.random.fold_in(base, i), snr)
        vals = {k: float(v) for k, v in sums.items()}
        total = vals if total is None else {k: total[k] + vals[k]
                                            for k in vals}
    assert sharded["trials"] == total["trials"] == 4 * res
    for k in sharded:
        if k == "T":
            # borderline 1e-5-allclose stops can flip by one iteration
            # under the kernel's different accumulation order (same
            # class as dense-vs-banded XLA; see BASELINE.md)
            assert abs(sharded[k] - total[k]) <= 2.0
        else:
            assert sharded[k] == pytest.approx(total[k], rel=1e-3,
                                               abs=1e-3), k


def test_dp_sharded_step_matches_serial(eight_devices):
    cfg = _cfg()
    res = 4
    m = mesh_mod.make_mesh(trials=8, model=1, devices=eight_devices)
    step = psweep.make_sharded_step(cfg, "bamp", "sparc", res, m,
                                    operator_form="banded")
    base = jax.random.PRNGKey(7)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(8)).reshape(8, 1, 2)
    snr = jnp.asarray(6.0, jnp.float32)
    sharded = {k: float(v) for k, v in step(keys, snr).items()}

    # serial recomputation with the same keys and the same operator form
    fn = montecarlo.make_realization_fn(cfg, "bamp", "sparc", res,
                                        operator_form="banded")
    total = None
    for i in range(8):
        sums = fn(jax.random.fold_in(base, i), snr)
        vals = {k: float(v) for k, v in sums.items()}
        total = vals if total is None else {k: total[k] + vals[k]
                                            for k in vals}
    assert sharded["trials"] == total["trials"] == 8 * res
    for k in sharded:
        assert sharded[k] == pytest.approx(total[k], rel=1e-4, abs=1e-3), k


def test_dp_sharded_step_use_pallas(eight_devices):
    """The sharded DP path composes with the fused Pallas kernel (interpret
    mode on CPU): same statistics as the serial XLA decode."""
    cfg = _cfg(Lin=8, Lh=3)
    res = 8
    m = mesh_mod.make_mesh(trials=4, model=1, devices=eight_devices[:4])
    step = psweep.make_sharded_step(cfg, "bamp", "sparc", res, m,
                                    operator_form="banded",
                                    use_pallas=True)
    base = jax.random.PRNGKey(5)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(4)).reshape(4, 1, 2)
    snr = jnp.asarray(7.0, jnp.float32)
    sharded = {k: float(v) for k, v in step(keys, snr).items()}

    fn = montecarlo.make_realization_fn(cfg, "bamp", "sparc", res,
                                        operator_form="banded")
    total = None
    for i in range(4):
        vals = {k: float(v) for k, v in fn(jax.random.fold_in(base, i),
                                           snr).items()}
        total = vals if total is None else {k: total[k] + vals[k]
                                            for k in vals}
    assert sharded["trials"] == total["trials"] == 4 * res
    for k in sharded:
        if k == "T":
            # kernel-vs-XLA comparison: f32 accumulation order can flip
            # a borderline 1e-5 allclose decision, shifting one trial's
            # iteration count by +-1 (same class as dense-vs-banded XLA)
            assert sharded[k] == pytest.approx(total[k], abs=2.0), k
        else:
            assert sharded[k] == pytest.approx(total[k], rel=1e-4,
                                               abs=1e-3), k


def test_tp_decode_matches_dense(eight_devices):
    cfg = _cfg(Lin=4)
    B = 3
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 8.0
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    sigma2 = cfg.sigma2(snr)

    ref = bamp.decode(A, y, sigma2, cfg)

    from jax.sharding import PartitionSpec as P
    from amp_sparc_spatialmodulation_tpu.parallel import tensor

    m = mesh_mod.make_mesh(trials=1, model=4, devices=eight_devices[:4])

    def run(A_full, y_full):
        A_k = tensor.shard_columns(A_full, cfg)
        xmap_k, xmmse_k, var_k, T = tensor.decode(A_k, y_full, sigma2, cfg)
        return (tensor.gather_columns(xmap_k),
                tensor.gather_columns(xmmse_k), T)

    sharded = jax.jit(jax.shard_map(run, mesh=m, in_specs=(P(), P()),
                                    out_specs=(P(), P(), P()),
                                    check_vma=False))
    xmap, xmmse, T = sharded(A, y)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(xmap), np.asarray(ref.xmap),
                               atol=2e-3)


def test_tp_sharded_sweep_step(eight_devices):
    cfg = _cfg(Lin=4)
    m = mesh_mod.make_mesh(trials=2, model=2, devices=eight_devices[:4])
    step = psweep.make_sharded_step(cfg, "bamp", "sparc", res=4, mesh=m)
    base = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(2)).reshape(2, 1, 2)
    out = {k: float(v) for k, v in step(keys,
                                        jnp.asarray(7.0, jnp.float32)).items()}
    assert out["trials"] == 2 * 4
    assert out["fer"] <= 2 * 4


@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_two_phase_matches_simulator(eight_devices, tmp_path,
                                             use_pallas):
    """ShardedSimulator with two_phase (and the fused kernel) on must match
    the single-device Simulator — same keys → same per-realization decode
    trajectories; only the metric reduction order differs."""
    cfg = _cfg(Lin=8, Lh=3, iterations=30)
    m = mesh_mod.make_mesh(trials=4, model=1, devices=eight_devices[:4])
    kw = dict(algo="bamp", two_phase=6, use_pallas=use_pallas)
    s1 = montecarlo.Simulator(cfg, out_root=str(tmp_path / "a"), **kw)
    s2 = psweep.ShardedSimulator(cfg, mesh=m, out_root=str(tmp_path / "b"),
                                 **kw)
    a1 = s1.run_point(7.0, epochs=128, res=16)
    a2 = s2.run_point(7.0, epochs=128, res=16)
    assert a1["T"] > 1.0  # the point actually iterates (tails exist)
    for k, v in a1.items():
        if use_pallas and k == "T":
            # the sharded run decodes smaller per-shard batches; the
            # different matmul blocking flips a handful of borderline
            # 1e-5 allclose decisions (same class as kernel-vs-XLA),
            # shifting mean T by a fraction of an iteration ...
            assert a2[k] == pytest.approx(v, abs=0.5), k
        elif use_pallas:
            # ... and the flipped trials' extra iterations perturb the
            # continuous metrics at the 1e-6 level.  The bit-tight
            # structural guarantee for the sharded composition is the
            # use_pallas=False parametrization above.
            assert a2[k] == pytest.approx(v, rel=1e-3, abs=1e-9), k
        else:
            assert a2[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k


def test_sharded_two_phase_no_tail_fast_path(eight_devices, tmp_path):
    """At high SNR every trial converges within k1 — the eval_all path."""
    cfg = _cfg(Lin=8, Lh=3, iterations=30)
    m = mesh_mod.make_mesh(trials=4, model=1, devices=eight_devices[:4])
    s1 = montecarlo.Simulator(cfg, algo="bamp", two_phase=25,
                              out_root=str(tmp_path / "a"))
    s2 = psweep.ShardedSimulator(cfg, mesh=m, algo="bamp", two_phase=25,
                                 out_root=str(tmp_path / "b"))
    a1 = s1.run_point(18.0, epochs=64, res=16)
    a2 = s2.run_point(18.0, epochs=64, res=16)
    for k, v in a1.items():
        assert a2[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k


def test_sharded_simulator_runs(eight_devices, tmp_path):
    cfg = _cfg()
    m = mesh_mod.make_mesh(trials=8, model=1, devices=eight_devices)
    sim = psweep.ShardedSimulator(cfg, mesh=m, algo="bamp",
                                  out_root=str(tmp_path))
    avg = sim.run_point(8.0, epochs=64, res=4)
    assert 0.0 <= avg["fer"] <= 1.0
    assert avg["T"] >= 1.0


def test_tp_vamp_decode_matches_single_device(eight_devices):
    """SV-domain column-sharded VAMP equals the single-device decode:
    identical per-trial T, matching pseudo-data/posterior trajectories."""
    from amp_sparc_spatialmodulation_tpu.models import vamp
    from amp_sparc_spatialmodulation_tpu.parallel import tensor, vamp_tp

    cfg = _cfg(Lin=4, iterations=15)
    B = 3
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    _, A = channel.generate_as_sparc(k1, cfg)
    msg = message.generate_message(k2, cfg, B)
    snr = 10.0
    y = msg.x @ A.T + channel.awgn(k3, cfg, snr, B)
    sigma2 = cfg.sigma2(snr)

    dec = vamp.svd(A)
    ref = vamp.decode(dec, y, sigma2, cfg)

    from jax.sharding import PartitionSpec as P

    m = mesh_mod.make_mesh(trials=1, model=4, devices=eight_devices[:4])

    def run(U, s, Vh, y_full):
        Vh_k = tensor.shard_columns(Vh, cfg)
        r_k, xmmse_k, var_k, T = vamp_tp.decode(U, s, Vh_k, y_full,
                                                sigma2, cfg)
        return (tensor.gather_columns(r_k),
                tensor.gather_columns(xmmse_k), T)

    sharded = jax.jit(jax.shard_map(
        run, mesh=m, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False))
    r, xmmse, T = sharded(dec.U, dec.s, dec.Vh, y)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(ref.T))
    np.testing.assert_allclose(np.asarray(xmmse), np.asarray(ref.xmmse),
                               atol=2e-4)
    # The extrinsic pseudo-data divides by (1-alpha) with alpha clipped at
    # 1-1e-5, so psum-vs-matmul ulp reordering is amplified ~1e4x in r;
    # the posterior (above) and the decisions it drives are unaffected.
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref.xmap),
                               atol=2e-2)


def test_tp_vamp_sharded_sweep_step(eight_devices):
    """make_sharded_step on a (trials=2, model=2) mesh runs VAMP with the
    SV-domain columns sharded and psum-reduced statistics that match the
    model=1 mesh bit-for-bit in expectation (same keys, same channel)."""
    cfg = _cfg(Lin=4, iterations=15)
    res = 4
    base = jax.random.PRNGKey(13)
    keys2 = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(2)).reshape(2, 1, 2)

    m_tp = mesh_mod.make_mesh(trials=2, model=2, devices=eight_devices[:4])
    step_tp = psweep.make_sharded_step(cfg, "vamp", "sparc", res, m_tp)
    out_tp = {k: float(v) for k, v in
              step_tp(keys2, jnp.asarray(8.0, jnp.float32)).items()}

    m_dp = mesh_mod.make_mesh(trials=2, model=1, devices=eight_devices[:2])
    step_dp = psweep.make_sharded_step(cfg, "vamp", "sparc", res, m_dp,
                                       use_pallas=False)
    out_dp = {k: float(v) for k, v in
              step_dp(keys2, jnp.asarray(8.0, jnp.float32)).items()}

    assert out_tp["trials"] == 2 * res == out_dp["trials"]
    for k in ("fer", "ser"):
        np.testing.assert_allclose(out_tp[k], out_dp[k], rtol=1e-4,
                                   err_msg=k)
    # Borderline 1e-5-allclose convergence decisions can flip a trial's
    # stop iteration under the TP path's psum accumulation order (same
    # class as the fused-kernel meanT flutter recorded in BASELINE.md);
    # the error-rate physics above must still agree exactly.
    np.testing.assert_allclose(out_tp["T"], out_dp["T"], rtol=5e-2,
                               err_msg="T")


@pytest.mark.parametrize("algo", ["bamp", "scamp", "vamp"])
def test_tp_two_phase_matches_single_phase(eight_devices, algo):
    """Continuation batching on a (trials=2, model=2) mesh: phase-1 decode
    capped at k1, host-side trial compaction (identical rows on every
    frame shard), phase-2 resume of the column-sharded state — the
    statistics must match the single-phase model-parallel step (same
    keys, same channels; resumability is trajectory-exact)."""
    kw = dict(Lin=4, iterations=25)
    if algo == "scamp":
        kw["mode"] = "sparc"
    cfg = _cfg(**kw)
    res = 8
    base = jax.random.PRNGKey(21)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(2)).reshape(2, 1, 2)
    snr = jnp.asarray(9.0, jnp.float32)

    m = mesh_mod.make_mesh(trials=2, model=2, devices=eight_devices[:4])
    one = psweep.make_sharded_step(cfg, algo, "sparc", res, m)
    out1 = {k: float(v) for k, v in one(keys, snr).items()}

    fns = psweep.make_sharded_two_phase_fns(cfg, algo, "sparc", res, 3, m)
    out2 = {k: float(v) for k, v in
            psweep.run_sharded_two_phase(fns, keys, snr, res,
                                         min_bucket=4).items()}
    assert out2["trials"] == 2 * res == out1["trials"]
    for k in ("fer", "ser", "T", "nMSE"):
        np.testing.assert_allclose(out2[k], out1[k], rtol=1e-5,
                                   err_msg=k)


def test_tp_two_phase_dense_iid_matches_single_phase(eight_devices):
    """Dense column-TP (iid channel) is resumable: continuation batching
    on a (trials=2, model=2) mesh matches the single-phase model-parallel
    step (same keys -> identical trajectories)."""
    cfg = _cfg(Lin=4, iterations=25)
    res = 8
    base = jax.random.PRNGKey(23)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(2)).reshape(2, 1, 2)
    snr = jnp.asarray(9.0, jnp.float32)

    m = mesh_mod.make_mesh(trials=2, model=2, devices=eight_devices[:4])
    one = psweep.make_sharded_step(cfg, "bamp", "iid", res, m)
    out1 = {k: float(v) for k, v in one(keys, snr).items()}

    fns = psweep.make_sharded_two_phase_fns(cfg, "bamp", "iid", res, 3, m)
    out2 = {k: float(v) for k, v in
            psweep.run_sharded_two_phase(fns, keys, snr, res,
                                         min_bucket=4).items()}
    assert out2["trials"] == 2 * res == out1["trials"]
    for k in ("fer", "ser", "T", "nMSE"):
        np.testing.assert_allclose(out2[k], out1[k], rtol=1e-5,
                                   err_msg=k)
