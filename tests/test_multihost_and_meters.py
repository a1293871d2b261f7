"""Tests for multihost helpers and the detection-side meters."""

import io
import contextlib

import numpy as np

from vit_torch_tpu.parallel.multihost import (
    all_gather_objects, init_distributed_mode, is_main_process,
    save_on_master,
)
from vit_torch_tpu.utils.stats import MetricLogger, SmoothedValue


def test_init_distributed_single_process():
    info = init_distributed_mode()
    assert info["rank"] == 0 and info["world_size"] == 1
    assert info["global_devices"] >= 1
    assert is_main_process()


def test_all_gather_objects_single():
    assert all_gather_objects({"a": 1}) == [{"a": 1}]


def test_save_on_master_runs():
    calls = []
    save_on_master(lambda x: calls.append(x), 42)
    assert calls == [42]


def test_smoothed_value_window_and_global():
    s = SmoothedValue(window_size=3)
    for v in (1, 2, 3, 4, 5):
        s.update(v)
    assert s.window == [3, 4, 5]
    assert s.median == 4
    assert s.global_avg == 3.0
    assert s.value == 5
    assert "4.0000" in str(s)


def test_metric_logger_log_every():
    m = MetricLogger()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        for i in m.log_every(range(6), print_freq=2, header="ep0"):
            m.update(loss=1.0 / (i + 1))
    out = buf.getvalue()
    assert "ep0" in out and "eta" in out and "done in" in out
    assert abs(m.loss.global_avg - np.mean([1 / (i + 1) for i in range(6)])) < 1e-9
