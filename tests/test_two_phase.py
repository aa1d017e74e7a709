"""Continuation batching must be trajectory-identical to single-phase."""
import jax
import numpy as np
import pytest

from amp_sparc_spatialmodulation_tpu.config import Config
from amp_sparc_spatialmodulation_tpu.models.montecarlo import Simulator


@pytest.mark.parametrize("k1", [4, 12])
def test_two_phase_matches_single_phase(tmp_path, k1):
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    s1 = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "a"))
    s2 = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "b"),
                   two_phase=k1)
    a1 = s1.run_point(6.0, epochs=256, res=64)
    a2 = s2.run_point(6.0, epochs=256, res=64)
    for k, v in a1.items():
        assert a2[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k


def test_ingraph_compaction_matches_single_phase():
    """phase2's lax.cond mid-rung (bucket >= 512) must leave the metric
    sums identical to the plain single-phase decode."""
    import jax.numpy as jnp
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    res = 1024
    snr = jnp.float32(10 ** ((7.0 + 10 * np.log10(cfg.code_rate)) / 10))
    key = jax.random.PRNGKey(5)
    ref = fetch_sums(jax.jit(montecarlo.make_realization_fn(
        cfg, "bamp", "segmented", res, operator_form="banded"))(key, snr))
    fns = montecarlo.make_two_phase_fns(cfg, "bamp", "segmented", res, 4,
                                        operator_form="banded")
    # min_bucket=512 pins the phase-2 bucket into the in-graph-rung
    # regime regardless of how many trials survive phase 1.
    out = fetch_sums(montecarlo.run_two_phase_realization(
        fns, key, snr, min_bucket=512))
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k


def test_phase_ladder_matches_single_phase():
    """The geometric re-compaction ladder (opt-in) only changes batch
    shapes — metric sums must match the single-phase decode exactly."""
    import jax.numpy as jnp
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    res = 128
    snr = jnp.float32(10 ** ((6.0 + 10 * np.log10(cfg.code_rate)) / 10))
    key = jax.random.PRNGKey(3)
    ref = fetch_sums(jax.jit(montecarlo.make_realization_fn(
        cfg, "bamp", "segmented", res, operator_form="banded"))(key, snr))
    fns = montecarlo.make_two_phase_fns(cfg, "bamp", "segmented", res, 4,
                                        operator_form="banded")
    lad = fetch_sums(montecarlo.run_two_phase_realization(
        fns, key, snr, min_bucket=8, ladder=True))
    for k, v in ref.items():
        assert lad[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k


@pytest.mark.parametrize("algo,mode", [("scamp", "sparc"), ("vamp", "segmented"),
                                       ("vamp2", "segmented")])
def test_two_phase_matches_single_phase_all_algos(tmp_path, algo, mode):
    """Continuation batching generalizes beyond BAMP: every decoder state
    is resumable, so the two-phase split must be trajectory-identical."""
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode=mode,
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    s1 = Simulator(cfg, algo=algo, out_root=str(tmp_path / "a"))
    s2 = Simulator(cfg, algo=algo, out_root=str(tmp_path / "b"),
                   two_phase=6)
    a1 = s1.run_point(7.0, epochs=128, res=64)
    a2 = s2.run_point(7.0, epochs=128, res=64)
    for k, v in a1.items():
        assert a2[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k


def test_manifest_records_actual_trials(tmp_path):
    """chans_per_batch rounds the realization count up — the resume
    manifest must record the trials actually decoded, not the request."""
    import json
    import os
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=20)
    sim = Simulator(cfg, algo="bamp", out_root=str(tmp_path),
                    chans_per_batch=4)
    # epochs=6, res=2 -> 3 realizations, rounded up to 4 -> 8 trials
    assert sim.trials_per_point(6, 2) == 8
    sim.simulate(epochs=6, res=2, start=20.0, final=20.0)
    manifest = json.load(open(os.path.join(sim.path, "manifest.json")))
    assert manifest["points"]["20.0"]["trials"] == 8
    # two-phase runs exactly ceil(epochs/res) realizations
    sim2 = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "tp"),
                     two_phase=5)
    assert sim2.trials_per_point(6, 2) == 6


def test_chans_per_batch_matches_single(tmp_path):
    """Vmapping C realizations per call must not change the statistics."""
    from amp_sparc_spatialmodulation_tpu.config import Config
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=30)
    s1 = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "a"),
                   chans_per_batch=1)
    s2 = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "b"),
                   chans_per_batch=4)
    a1 = s1.run_point(8.0, epochs=256, res=64)
    a2 = s2.run_point(8.0, epochs=256, res=64)
    for k, v in a1.items():
        assert a2[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k


def test_auto_k1_grid_selection():
    """auto_k1 picks the smallest grid value just above mean T + 1,
    clamped to the iteration cap (k1 == cap degenerates to single-phase,
    right for cap-running workloads)."""
    from amp_sparc_spatialmodulation_tpu.models.montecarlo import auto_k1
    assert auto_k1(10.92, 100) == 12       # the measured flagship optimum
    assert auto_k1(56.6, 100) == 64
    assert auto_k1(6.1, 100) == 8
    assert auto_k1(None, 100) == 16        # no history -> legacy default
    assert auto_k1(99.0, 100) == 100       # clamp: meanT at cap
    assert auto_k1(3.0, 100) == 4


def test_auto_k1_sweep_matches_static(tmp_path):
    """two_phase='auto' is a pure scheduling choice: per-point metrics
    must match the static-k1 sweep exactly, while the auto simulator
    actually varies k1 with the measured mean T."""
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    s_static = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "a"),
                         two_phase=12)
    s_auto = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "b"),
                       two_phase="auto")
    for i, ebn0 in enumerate([5.0, 7.0]):
        a = s_static.run_point(ebn0, epochs=256, res=64, snr_idx=i)
        b = s_auto.run_point(ebn0, epochs=256, res=64, snr_idx=i)
        for k, v in a.items():
            assert b[k] == pytest.approx(v, rel=1e-5, abs=1e-9), (ebn0, k)
    # auto picked per-point k1s (probe-based) and recorded history
    assert len(s_auto._tp_cache) >= 1
    assert s_auto._last_meanT is not None


def test_precision_auto_policy(tmp_path):
    """precision='auto' selects HIGH exactly when the previous point's
    mean T pinned at the iteration cap, HIGHEST otherwise (see the
    policy note in Simulator.__init__)."""
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    s = Simulator(cfg, algo="bamp", out_root=str(tmp_path),
                  precision="auto")
    assert s._effective_precision() == jax.lax.Precision.HIGHEST
    s._last_meanT = 11.2                       # converging regime
    assert s._effective_precision() == jax.lax.Precision.HIGHEST
    s._last_meanT = float(cfg.N_Layers)        # cap-running regime
    assert s._effective_precision() == jax.lax.Precision.HIGH
    s._last_meanT = cfg.N_Layers - 0.5         # leaves the regime
    assert s._effective_precision() == jax.lax.Precision.HIGHEST
    # fixed precision ignores history
    s2 = Simulator(cfg, algo="bamp", out_root=str(tmp_path))
    s2._last_meanT = float(cfg.N_Layers)
    assert s2._effective_precision() == jax.lax.Precision.HIGHEST


def test_precision_auto_runs_point(tmp_path):
    """A cap-running auto simulator actually compiles and runs the HIGH
    path (smoke: metrics finite, T bookkeeping intact)."""
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=8)
    s = Simulator(cfg, algo="bamp", out_root=str(tmp_path),
                  precision="auto")
    s._last_meanT = float(cfg.N_Layers)        # force the HIGH branch
    out = s.run_point(2.0, epochs=64, res=64)
    assert np.isfinite(out["fer"]) and 0 < out["T"] <= cfg.N_Layers


def test_bucket_eval_matches_full_eval(monkeypatch, tmp_path):
    """The opt-in bucket-only evaluation (AMP_BUCKET_EVAL=1: frozen
    trials evaluated inside phase 1, continuation evaluates just the
    bucket with padding masked) must reproduce the default full-batch
    evaluation up to f32 re-association."""
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    ref = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "a"),
                    two_phase=6).run_point(6.0, epochs=256, res=64)
    monkeypatch.setenv("AMP_BUCKET_EVAL", "1")
    out = Simulator(cfg, algo="bamp", out_root=str(tmp_path / "b"),
                    two_phase=6).run_point(6.0, epochs=256, res=64)
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, rel=1e-5, abs=1e-9), k


def test_phase123_single_program_matches_host_path():
    """The single-program realization (static bucket, in-graph gather)
    must produce identical sums to the host-orchestrated path: the
    gather keeps actives in original order and the pad rows are frozen
    either way."""
    import jax.numpy as jnp
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    res = 256
    snr = jnp.float32(10 ** ((6.0 + 10 * np.log10(cfg.code_rate)) / 10))
    key = jax.random.PRNGKey(11)
    fns = montecarlo.make_two_phase_fns(cfg, "bamp", "segmented", res, 6,
                                        operator_form="banded")
    ref = fetch_sums(montecarlo.run_two_phase_realization(fns, key, snr))
    hint = {}
    # first call (no hint yet) takes the host path and seeds the hint
    first = fetch_sums(montecarlo.run_two_phase_realization(
        fns, key, snr, hint=hint))
    assert hint.get("bucket")
    for k, v in ref.items():
        assert first[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k
    # second call takes the fused single-program path
    fused = montecarlo.run_two_phase_realization(fns, key, snr, hint=hint)
    assert "_overflow" not in fused and "_n_active" not in fused
    for k, v in ref.items():
        assert fused[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k


def test_phase123_overflow_falls_back():
    """A too-small hint bucket must be detected (survivors > bucket) and
    the realization redone on the host path with correct sums."""
    import jax.numpy as jnp
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    res = 256
    # low SNR: most trials survive phase 1 -> bucket=8 must overflow
    snr = jnp.float32(10 ** ((2.0 + 10 * np.log10(cfg.code_rate)) / 10))
    key = jax.random.PRNGKey(12)
    fns = montecarlo.make_two_phase_fns(cfg, "bamp", "segmented", res, 4,
                                        operator_form="banded")
    ref = fetch_sums(montecarlo.run_two_phase_realization(fns, key, snr))
    hint = {"bucket": 8}
    out = fetch_sums(montecarlo.run_two_phase_realization(
        fns, key, snr, hint=hint))
    assert hint["bucket"] > 8        # reseeded from the true count
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k


def test_run_two_phase_batches_defers_and_falls_back():
    """The deferred-fetch batch runner accumulates phase123 sums on
    device with ONE fetch; a too-small bucket is detected via the summed
    overflow flag and the whole chunk redone on the host path with
    correct totals."""
    import jax.numpy as jnp
    from amp_sparc_spatialmodulation_tpu.models import montecarlo
    from amp_sparc_spatialmodulation_tpu.utils.metrics import fetch_sums
    cfg = Config(Nt=16, Na=4, Nr=10, Lin=6, Lh=3, mode="segmented",
                 alphabet="OOK", profile="uniform", trunc="tail",
                 iterations=40)
    res = 128
    snr = jnp.float32(10 ** ((6.0 + 10 * np.log10(cfg.code_rate)) / 10))
    keys = [jax.random.PRNGKey(20 + i) for i in range(3)]
    fns = montecarlo.make_two_phase_fns(cfg, "bamp", "segmented", res, 6,
                                        operator_form="banded")
    ref = None
    from amp_sparc_spatialmodulation_tpu.utils import metrics as M
    for k in keys:
        ref = M.accumulate(ref, montecarlo.run_two_phase_realization(
            fns, k, snr))
    ref = fetch_sums(ref)
    # healthy hint: deferred path
    hint = {"bucket": res}        # cannot overflow
    out = montecarlo.run_two_phase_batches(fns, keys, snr, hint)
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k
    # overflowing hint: falls back, still correct
    hint = {"bucket": 8}
    out2 = montecarlo.run_two_phase_batches(fns, keys, snr, hint)
    for k, v in ref.items():
        assert out2[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k
    assert "_overflow" not in out and "_overflow" not in out2
