"""Profiling utilities tests."""

import time

import numpy as np

from tpuflow.runtime.profiling import StageTimer, device_trace, flow_statistics


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.02
    assert t.mean("a") >= 0.01
    assert t.mean("missing") == 0.0
    report = t.report()
    assert "a" in report and "b" in report


def test_device_trace_noop():
    with device_trace(None):
        pass  # must not raise


def test_flow_statistics():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[0, 0] = [3.0, 4.0]
    stats = {k: float(v) for k, v in flow_statistics(flow).items()}
    assert stats["min_flow"] == 0.0
    assert stats["max_flow"] == 4.0
    assert abs(stats["mean_magnitude"] - 5.0 / 64) < 1e-6
