"""Tests for the declarative flag/config system (vit_torch_tpu/utils/args.py).

Behavioral parity targets from the reference ``utils_args.py``: tuple schema,
bool flags as store_true/false, list defaults as nargs='+', choices
validation, alias keys, defaults visible without parsing.
"""

import pytest

from vit_torch_tpu.utils.args import ARGS, classification_config


def test_defaults_without_parsing():
    A = ARGS([("epoch", 100, int), ("lr", 0.001, float)])
    assert A.args["epoch"] == 100
    assert A.args["lr"] == 0.001


def test_parse_overrides():
    A = ARGS([("epoch", 100, int), ("fc", [], int, None, "fc units")])
    A.set_and_parse_args(["--epoch", "5", "--fc", "256", "128", "32"])
    assert A.args["epoch"] == 5
    assert A.args["fc"] == [256, 128, 32]


def test_bool_store_true_and_false():
    A = ARGS([("lineareval", False, bool), ("shuffle", True, bool)])
    A.set_and_parse_args([])
    assert A.args["lineareval"] is False and A.args["shuffle"] is True
    A2 = ARGS([("lineareval", False, bool), ("shuffle", True, bool)])
    A2.set_and_parse_args(["--lineareval", "--shuffle"])
    assert A2.args["lineareval"] is True and A2.args["shuffle"] is False


def test_choices_validated():
    A = ARGS([("opt", "sgd", str, ["sgd", "adam"])])
    with pytest.raises(SystemExit):  # argparse rejects invalid choice
        A.set_and_parse_args(["--opt", "bogus"])
    with pytest.raises(AssertionError):
        A.update(opt="bogus")


def test_aliases_share_value():
    A = ARGS([(("bs", "batch_size"), 32, int)])
    A.set_and_parse_args(["--batch_size", "64"])
    assert A.args["bs"] == 64 and A.args["batch_size"] == 64
    assert "bs" in A.info and "batch_size" not in A.info  # primary key only


def test_programmatic_update_validates_type():
    A = ARGS([("epoch", 100, int)])
    A.update(epoch="7")  # coercible
    assert A.args["epoch"] == 7
    with pytest.raises(AssertionError):
        A.update(epoch="seven")


def test_classification_config_surface():
    """The reference main.py flag surface must exist verbatim."""
    A = ARGS(classification_config())
    for flag in ["device", "epoch", "dataset", "bs", "arch", "lr", "lr_scheduler",
                 "lr_step", "lr_gamma", "lr_scale", "limit_train", "limit_test",
                 "stats_fp", "lineareval", "earlystop_epoch", "pretrained",
                 "note", "opt", "fc", "image_size"]:
        assert flag in A.args, f"missing reference flag --{flag}"
    ns = A.set_and_parse_args(
        ["--arch", "dino_vits16", "--lineareval", "--opt", "adamw",
         "--fc", "512", "--lr", "0.001", "--bs", "32"])
    assert A.args["arch"] == "dino_vits16"
    assert A.args["lineareval"] is True
    assert A.args["fc"] == [512]
