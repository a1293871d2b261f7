"""Classification CLI — the reference ``main.py`` rebuilt for TPU.

Flag surface kept verbatim (``--epoch --dataset --arch --fc --lineareval
--opt --lr --lr_scheduler --bs --image_size ...``, reference
``main.py:73-101``); run flow matches reference ``main():103-283``:
args → datasets → model zoo → trainer → fit → stats JSON.

Usage (mirrors README.md:23-39 of the reference):
    python -m vit_torch_tpu.cli.main --epoch 30 --dataset cifar10 \
        --arch dino_vitb8 --lineareval --opt adamw --lr 0.001 --fc 512
"""

from __future__ import annotations

import json
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from vit_torch_tpu.data.augment import make_eval_transform, make_train_augment
from vit_torch_tpu.data.datasets import Datasets
from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.parallel.mesh import make_mesh
from vit_torch_tpu.train.trainer import Trainer
from vit_torch_tpu.utils.args import ARGS, classification_config
from vit_torch_tpu.utils.stats import Stats, default_hardware


def main(argv: Optional[Sequence[str]] = None) -> Stats:
    A = ARGS(classification_config())
    A.set_and_parse_args(argv)
    args = A.args
    print("args:", json.dumps(A.info, indent=4))

    if args["device"] == "cpu":
        # switch the whole platform to CPU (the default backend may be a TPU
        # plugin; mixed-backend meshes compile pathologically slowly)
        jax.config.update("jax_platforms", "cpu")
    mesh = make_mesh(args["mesh"])
    dtype = jnp.bfloat16 if args["dtype"] == "bfloat16" else jnp.float32

    image_channels = 3
    if args["dataset"] == "tire":
        from vit_torch_tpu.data.tire import get_tire_dataset
        data = get_tire_dataset(args["data_path"] or args["root_path"],
                                image_size=args["image_size"] or 224,
                                bs=args["bs"], settings=args["tire_settings"],
                                seed=args["seed"],
                                limit_train=args["limit_train"],
                                limit_test=args["limit_test"],
                                aug_auto=args["aug_auto"])
        image_channels = data.image_channels
    else:
        data = Datasets(args["dataset"], image_size=args["image_size"],
                        bs=args["bs"], root_path=args["root_path"],
                        data_path=args["data_path"],
                        limit_train=args["limit_train"],
                        limit_test=args["limit_test"], seed=args["seed"])

    classifier = [*args["fc"], data.num_labels]
    zoo_model = VisionModelZoo.get_model(
        args["arch"], pretrained=args["pretrained"],
        classifier=classifier, image_size=data.image_size, dtype=dtype,
        image_channels=image_channels, torch_ckpt=args["torch_ckpt"] or None)

    init_params = None
    if args["pretrained"]:
        from vit_torch_tpu.checkpoint.torch_import import load_pretrained_params
        init_params = load_pretrained_params(
            zoo_model, image_size=data.image_size,
            torch_ckpt=args["torch_ckpt"] or None, seed=args["seed"],
            image_channels=image_channels)

    stats = Stats(
        splits=("train", "val"), stats_fp=args["stats_fp"], info=A.info,
        telem={
            "hardware": default_hardware(),
            "mode": "lineareval" if args["lineareval"] else "finetune",
            "bs": args["bs"],
            "sample_count_train": data.info["sample_count_train"],
            "sample_count_val": data.info["sample_count_val"],
        },
        epoch_total=args["epoch"],
        sample_totals={"train": data.info["sample_count_train"],
                       "val": data.info["sample_count_val"]},
    )

    trainer = Trainer(
        zoo_model,
        epochs=args["epoch"], lr=args["lr"], opt=args["opt"],
        lr_scheduler=args["lr_scheduler"], lr_step=args["lr_step"],
        lr_gamma=args["lr_gamma"], lr_scale=args["lr_scale"],
        lineareval=args["lineareval"],
        earlystop_epoch=args["earlystop_epoch"],
        seed=args["seed"], stats=stats,
        image_size=data.image_size, image_channels=image_channels,
        init_params=init_params, mesh=mesh, fsdp=args["fsdp"],
        ckpt_dir=args["ckpt_dir"], save_every=args["save_every"],
        resume=args["resume"], pipe_microbatches=args["pipe_microbatches"],
        augment_fn=(data.make_augment_fn(dtype=dtype)
                    if hasattr(data, "make_augment_fn") else
                    make_train_augment(**data.norm_values, dtype=dtype,
                                       auto_policy=args["aug_auto"] or None)),
        eval_transform=make_eval_transform(**data.norm_values, dtype=dtype),
    )
    # scan mode handles single-chip and pure data-parallel meshes; TP/SP/PP
    # meshes use the per-step sharded path
    use_scan = (args["scan"] and not args["fsdp"]
                and mesh.shape["model"] == 1 and mesh.shape["seq"] == 1
                and mesh.shape["pipe"] == 1 and hasattr(data, "sets"))
    sets = ({"train": data.sets["train"], "val": data.sets["test"]}
            if hasattr(data, "sets") and "test" in data.sets else None)
    if args["lineareval"] and args["cache_features"] and sets is not None:
        if args["fsdp"]:
            # the cached path runs unsharded scan fns — silently dropping
            # the requested ZeRO-3 sharding would defeat its purpose
            raise SystemExit("--fsdp is not supported with --cache_features "
                             "(the cached lineareval path is single-program);"
                             " drop one of the two flags")
        trainer.fit_lineareval_cached(sets, args["bs"])
    elif use_scan and sets is not None:
        trainer.fit_scan(sets, args["bs"])
    else:
        trainer.fit(data.loaders)
    print("\nresults:", json.dumps(stats.update_results(), indent=2))
    if args["export_bundle"]:
        # ship the trained classifier as a serving bundle (weights +
        # in-graph normalization baked into StableHLO — serving/export.py)
        from vit_torch_tpu.serving import export_classifier, save_bundle
        export_vars = jax.device_get(trainer.state.variables())
        if trainer.from_pipe is not None:
            # pipeline training keeps blocks stacked; bundles (like
            # checkpoint interchange) use the standard layout
            export_vars = {**export_vars,
                           "params": trainer.from_pipe(export_vars["params"])}
        exported = export_classifier(
            zoo_model, export_vars,
            image_size=data.image_size,
            batch_sizes=[int(b) for b in args["export_bs"].split(",") if b],
            norm=data.norm_values)
        save_bundle(args["export_bundle"], exported)
        print("serving bundle saved to", args["export_bundle"])
    if args["stats_fp"]:
        print("stats saved to", args["stats_fp"])
    return stats


if __name__ == "__main__":
    main()
