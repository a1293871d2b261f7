"""End-to-end CLI smoke tests (classification)."""

import json

import numpy as np
import pytest

from vit_torch_tpu.cli.main import main


def test_cli_lineareval_scan(tmp_path):
    fp = str(tmp_path / "stats.json")
    main(["--device", "cpu", "--dataset", "synthetic", "--arch",
          "vit_tiny_test", "--epoch", "2", "--bs", "16", "--image_size", "16",
          "--lineareval", "--opt", "adamw", "--fc", "32",
          "--earlystop_epoch", "0", "--stats_fp", fp])
    d = json.load(open(fp))
    assert d["telem"]["mode"] == "lineareval"
    assert len(d["train"]) == 2 and len(d["val"]) == 2
    assert d["telem"]["completed"] is True
    assert np.isfinite(d["results"]["val.loss"])


def test_cli_finetune_per_step_path(tmp_path):
    """--scan 0 exercises the per-step sharded path."""
    fp = str(tmp_path / "stats.json")
    main(["--device", "cpu", "--dataset", "synthetic", "--arch",
          "vit_tiny_test", "--epoch", "1", "--bs", "16", "--image_size", "16",
          "--scan", "0", "--earlystop_epoch", "0", "--stats_fp", fp])
    d = json.load(open(fp))
    assert d["telem"]["mode"] == "finetune"
    assert len(d["train"]) == 1


def test_cli_dp_mesh_scan(tmp_path):
    """Data-parallel mesh + scan mode through the CLI."""
    fp = str(tmp_path / "stats.json")
    main(["--device", "cpu", "--mesh", "data=8", "--dataset", "synthetic",
          "--arch", "vit_tiny_test", "--epoch", "1", "--bs", "16",
          "--image_size", "16", "--earlystop_epoch", "0", "--stats_fp", fp])
    d = json.load(open(fp))
    assert d["info"]["mesh"] == "data=8"
    assert len(d["train"]) == 1


def test_cli_seq_parallel_mesh(tmp_path):
    """--mesh seq=2 trains through the per-step path with ring attention
    dispatched in the train step (VERDICT round-1 item 7)."""
    fp = str(tmp_path / "stats.json")
    fp1 = str(tmp_path / "stats1.json")
    common = ["--device", "cpu", "--dataset", "synthetic", "--arch",
              "vit_tiny_test", "--epoch", "1", "--bs", "16",
              "--image_size", "16", "--earlystop_epoch", "0", "--seed", "0"]
    main(common + ["--mesh", "data=4,seq=2", "--stats_fp", fp])
    main(common + ["--mesh", "data=8", "--stats_fp", fp1])
    d = json.load(open(fp))
    d1 = json.load(open(fp1))
    assert d["info"]["mesh"] == "data=4,seq=2"
    # sequence parallelism is numerically equivalent to the seq=1 program
    assert abs(d["train"][-1]["loss"] - d1["train"][-1]["loss"]) < 1e-3


def test_cli_pipeline_parallel_mesh(tmp_path):
    """--mesh data=4,pipe=2 trains the ViT through the GPipe pipeline path
    and matches the pure-DP trajectory."""
    fp = str(tmp_path / "stats.json")
    fp1 = str(tmp_path / "stats1.json")
    common = ["--device", "cpu", "--dataset", "synthetic", "--arch",
              "vit_tiny_test", "--epoch", "1", "--bs", "16",
              "--image_size", "16", "--earlystop_epoch", "0", "--seed", "0"]
    main(common + ["--mesh", "data=4,pipe=2", "--stats_fp", fp])
    main(common + ["--mesh", "data=8", "--stats_fp", fp1])
    d = json.load(open(fp))
    d1 = json.load(open(fp1))
    assert d["info"]["mesh"] == "data=4,pipe=2"
    assert abs(d["train"][-1]["loss"] - d1["train"][-1]["loss"]) < 1e-3


def test_coco_cli_flag_guards():
    """Invalid detection flag combinations exit with a clear message
    instead of silently mis-evaluating (round-2 advisor finding)."""
    import pytest
    from vit_torch_tpu.cli.coco import main as coco_main
    base = ["--test", "--device", "cpu", "--epochs", "1"]
    with pytest.raises(SystemExit):
        coco_main(base + ["--keypoints", "--head", "detr"])
    with pytest.raises(SystemExit):
        coco_main(base + ["--keypoints", "--head", "faster_rcnn", "--masks"])
    with pytest.raises(SystemExit):
        coco_main(base + ["--head", "faster_rcnn",
                          "--panoptic_root", "/nonexistent"])
    with pytest.raises(SystemExit):
        coco_main(base + ["--head", "detr", "--mesh", "data=8",
                          "--bs", "12"])
    # --masks with the box-only FRCNN head would KeyError at eval time
    with pytest.raises(SystemExit):
        coco_main(base + ["--head", "faster_rcnn", "--masks"])


def test_coco_cli_panoptic_test_implies_masks(monkeypatch):
    """--panoptic_root --test must smoke the mask path (masks implied),
    not silently run a bbox-only DETR."""
    import pytest
    import vit_torch_tpu.detection.engine as engine_mod
    from vit_torch_tpu.cli.coco import main as coco_main

    seen = {}

    class _Abort(Exception):
        pass

    def spy_trainer(model, params, **kw):
        seen.update(kw)
        raise _Abort

    monkeypatch.setattr(engine_mod, "DetectionTrainer", spy_trainer)
    with pytest.raises(_Abort):
        coco_main(["--test", "--device", "cpu",
                   "--panoptic_root", "/nonexistent"])
    assert seen["masks"] is True
