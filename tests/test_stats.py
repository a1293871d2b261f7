"""Tests for the stats/telemetry subsystem (vit_torch_tpu/utils/stats.py).

Schema parity target: the reference's run-log JSON layout
``{info, telem, results, train: [rows], val: [rows]}`` with per-epoch rows
``{epoch, sample, lr, loss, acc, time, time_start, time_finish, time_cost}``
(reference ``utils_stats.py:493-507,639-719``; verified against
``logs/massA/stats_210716_021606.json``).
"""

import json

from vit_torch_tpu.utils.stats import (
    CounterLog, Metrics, Stats, StatMetrics, TimerLog, format_time, progress_bar,
)


def run_fake_training(stats_fp=None, epochs=3):
    S = Stats(splits=("train", "val"), stats_fp=stats_fp,
              info={"arch": "dino_vits16", "bs": 32}, epoch_total=epochs,
              sample_totals={"train": 100, "val": 50})
    for epoch in range(epochs):
        for split, n in [("train", 100), ("val", 50)]:
            S.set_split(split)
            S.new_round(epoch)
            for step in range(5):
                S.update(sample_count=n // 5, lr=1e-3,
                         acc=0.5 + 0.1 * epoch, loss=1.0 - 0.2 * epoch)
            S.finish_round(save=stats_fp is not None)
    S.finish(save=stats_fp is not None)
    return S


def test_metrics_weighted_average_and_best():
    m = Metrics("acc", higher_is_better=True)
    m.update(1.0, weight=1)
    m.update(0.0, weight=3)
    assert abs(m.avg - 0.25) < 1e-9
    assert m.finish_round() == 0.25
    m.update(0.5, weight=1)
    m.finish_round()
    assert m.best == 0.5 and m.best_index == 1 and m.is_best_round()

    lo = Metrics("loss", higher_is_better=False)
    for v in (2.0, 1.0, 3.0):
        lo.update(v)
        lo.finish_round()
    assert lo.best == 1.0 and lo.best_index == 1 and not lo.is_best_round()


def test_best_marker_fires_for_zero_baseline():
    """Reference bug (utils_stats.py:234-235): prev_best=0.0 was falsy so the
    (best) marker never rendered. Our is_best_round must work from 0.0."""
    m = Metrics("acc", higher_is_better=True)
    m.update(0.0)
    m.finish_round()
    m.update(0.1)
    m.finish_round()
    assert m.is_best_round()


def test_schema_matches_reference(tmp_path):
    fp = str(tmp_path / "stats.json")
    run_fake_training(stats_fp=fp)
    d = json.load(open(fp))
    # top-level sections
    for key in ("info", "telem", "results", "train", "val"):
        assert key in d
    # per-row schema
    row = d["train"][0]
    for key in ("epoch", "sample", "lr", "loss", "acc",
                "time", "time_start", "time_finish", "time_cost"):
        assert key in row, f"missing row key {key}"
    assert row["sample"] == 100
    # results keys used by the reference's plotting/compare tools
    for key in ("epochs", "epoch.time", "train.time", "val.time",
                "train.sample_time", "val.sample_time",
                "train.acc", "val.acc", "train.loss", "val.loss"):
        assert key in d["results"], f"missing results key {key}"
    # best-value semantics: acc is max, loss is min
    assert abs(d["results"]["val.acc"] - 0.7) < 1e-9
    assert abs(d["results"]["val.loss"] - 0.6) < 1e-9
    # telem section
    for key in ("hardware", "completed", "time_stamp", "time_start",
                "time_finish", "time_elapsed", "time_updated"):
        assert key in d["telem"]
    assert d["telem"]["completed"] is True


def test_format_time_day_constant():
    """Reference bug: 'd' was 864000 (10 days). Must be 86400."""
    assert format_time(86400) == "1d"
    assert format_time(90061) == "1d1h"
    assert format_time(59) == "59s"
    assert format_time(3600) == "1h"


def test_progress_bar_and_counter():
    assert progress_bar(0.0) == " " * 10
    assert progress_bar(1.0) == "█" * 10
    assert len(progress_bar(0.55)) == 10
    c = CounterLog("sample", total=100)
    c.update(50)
    assert c.progress == 0.5
    assert "sample[50/100]" in c.get_str()


def test_get_str_renders():
    S = run_fake_training()
    s = S.splits["train"].get_str()
    for frag in ("train", "epoch[", "sample[", "acc[", "loss[", "lr[", "time["):
        assert frag in s


def test_timerlog_progress():
    t = TimerLog()
    d = t.update(0.5)
    assert d["total"] >= d["elapsed"] >= 0
    assert d["remain"] >= 0
