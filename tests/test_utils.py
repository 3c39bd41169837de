"""Observability utilities."""

import time

from ptv_interpolation_tpu.utils import StageTimings, profiler_trace


def test_stage_timings_accumulate_and_report():
    t = StageTimings()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    assert t.stages["a"] >= 0.01
    rep = t.report()
    assert "a" in rep and "b" in rep and "total" in rep


def test_profiler_trace_noop_without_dir():
    with profiler_trace(None):
        x = 1 + 1
    assert x == 2
