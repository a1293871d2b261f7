"""Tests for visualization tools and profiling/telemetry utilities."""

import json
import os

import numpy as np

from vit_torch_tpu.utils.plots import (
    annotate, class_color, plot_detection_logs, plot_training_curves,
)
from vit_torch_tpu.utils.profiling import DeviceMemory, StepTimer, trace


def test_class_colors_distinct():
    colors = {class_color(i) for i in range(10)}
    assert len(colors) == 10


def test_annotate_saves(tmp_path):
    img = np.zeros((32, 32, 3), np.uint8)
    fp = str(tmp_path / "out.png")
    annotate(img, np.asarray([[4, 4, 20, 20]]), labels=[1], scores=[0.9],
             save_to=fp)
    assert os.path.getsize(fp) > 0


def test_plot_training_curves(tmp_path):
    d = {"info": {"arch": "x"},
         "train": [{"epoch": 0, "acc": 0.5, "loss": 1.0},
                   {"epoch": 1, "acc": 0.6, "loss": 0.8}],
         "val": [{"epoch": 0, "acc": 0.4, "loss": 1.1},
                 {"epoch": 1, "acc": 0.5, "loss": 0.9}]}
    src = tmp_path / "stats.json"
    src.write_text(json.dumps(d))
    fp = str(tmp_path / "curves.png")
    plot_training_curves(str(src), save_to=fp)
    assert os.path.getsize(fp) > 0


def test_plot_detection_logs(tmp_path):
    d = {"logs": [{"epoch": 0, "val": {"bbox": {"ap": 0.1}}},
                  {"epoch": 1, "val": {"bbox": {"ap": 0.2}}}]}
    src = tmp_path / "det.json"
    src.write_text(json.dumps(d))
    fp = str(tmp_path / "ap.png")
    plot_detection_logs(str(src), save_to=fp)
    assert os.path.getsize(fp) > 0


def test_device_memory_stats():
    mem = DeviceMemory()
    s = mem.stats()
    assert set(s) == {"total_gb", "used_gb", "free_gb", "peak_gb"}
    assert "hbm[" in mem.get_str()


def test_step_timer_with_fence():
    import jax.numpy as jnp
    t = StepTimer()
    t.start()
    x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
    dt = t.stop(fence_on=x)
    assert dt > 0
    assert t.ms_per_step > 0
    assert "step[" in t.get_str()


def test_trace_context(tmp_path):
    import jax.numpy as jnp
    with trace(str(tmp_path / "trace")):
        (jnp.ones((8, 8)) * 2).block_until_ready()
    assert os.path.isdir(str(tmp_path / "trace"))
