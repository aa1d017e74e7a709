"""Profiler phase timers and report format."""
import json
import time

from amp_sparc_spatialmodulation_tpu.utils.profiling import Profiler, xla_trace


def test_phase_accumulation(tmp_path):
    prof = Profiler()
    with prof.phase("decode", items=100):
        time.sleep(0.01)
    with prof.phase("decode", items=100):
        time.sleep(0.01)
    with prof.phase("export"):
        pass
    rep = prof.report()
    assert rep["decode"]["calls"] == 2
    assert rep["decode"]["items"] == 200
    assert rep["decode"]["seconds"] >= 0.02
    assert rep["decode"]["items_per_s"] > 0
    assert rep["export"]["items_per_s"] == 0
    path = tmp_path / "prof.json"
    prof.dump(str(path))
    assert json.load(open(path))["decode"]["calls"] == 2


def test_phase_records_on_exception():
    prof = Profiler()
    try:
        with prof.phase("boom", items=1):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert prof.phases["boom"].calls == 1


def test_xla_trace_noop():
    with xla_trace(None):
        pass  # no-op without a log dir
