"""Serving-export CLI: train (or import) a classifier, then ship it.

    python -m vit_torch_tpu.cli.export --arch dino_vits16 --dataset stl10 \
        --torch_ckpt /ckpts/dino_deitsmall16.pth --bs 1,8,32 --out /tmp/bundle

writes a self-contained StableHLO bundle (``serving/export.py``) that any
JAX runtime can serve without this package installed:

    from vit_torch_tpu.serving import load_bundle    # or plain jax.export
    model = load_bundle("/tmp/bundle")
    logits = model.predict(uint8_images)

``--w8a8`` bakes the dynamic-int8 MXU path into the artifact.  Without
``--torch_ckpt`` the export uses randomly-initialized weights (pipeline
smoke / shape validation only).  Beyond-reference surface: the reference
deploys via ``torch.save`` pickles that need the full framework at
serving time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _norm_for(norm_values, dataset: str):
    """Normalization constants for ``--dataset``, mirroring the training
    CLI: unknown (ImageFolder-style) dataset names fall back to the
    imagenet constants instead of crashing with a KeyError."""
    if dataset not in norm_values:
        print(f"note: no normalization entry for dataset '{dataset}' — "
              f"using imagenet constants (the ImageFolder default)",
              file=sys.stderr)
        return norm_values["imagenet"]
    return norm_values[dataset]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--arch", required=True)
    p.add_argument("--classifier", default="10",
                   help="comma-separated head units incl. class count, "
                        "e.g. 512,10 (reference [*fc, num_labels])")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--bs", default="1,8,32",
                   help="comma-separated batch-size buckets to export")
    p.add_argument("--dataset", default="synthetic",
                   help="normalization constants to bake in "
                        "(data.datasets.NORM_VALUES key)")
    p.add_argument("--torch_ckpt", default=None,
                   help="torch checkpoint for the backbone weights")
    p.add_argument("--platforms", default=None,
                   help="comma-separated export platforms, e.g. cpu,tpu "
                        "(default: trace-time backend)")
    p.add_argument("--w8a8", action="store_true",
                   help="bake the int8 serving path into the export "
                        "(weights prequantized host-side by default)")
    p.add_argument("--no_prequant", action="store_true",
                   help="with --w8a8: keep fp32 kernels + in-graph weight "
                        "quantize instead of baking int8 constants")
    p.add_argument("--param_dtype", default=None,
                   choices=[None, "bfloat16", "float32"],
                   help="cast baked params before export "
                        "(bfloat16 halves artifact size)")
    p.add_argument("--num_devices", type=int, default=1,
                   help=">1 exports a data-parallel bundle: the batch axis "
                        "shards over that many devices (serving-side DP)")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--out", required=True, help="bundle output directory")
    args = p.parse_args(argv)

    if args.w8a8:
        os.environ["VITX_W8A8"] = "1"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vit_torch_tpu.checkpoint.torch_import import load_pretrained_params
    from vit_torch_tpu.data.datasets import NORM_VALUES
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.serving import export_classifier, save_bundle

    classifier = [int(u) for u in args.classifier.split(",") if u]
    zm = VisionModelZoo.get_model(args.arch, classifier=classifier,
                                  image_size=args.image_size)
    if args.torch_ckpt:
        variables = load_pretrained_params(zm, args.image_size,
                                           args.torch_ckpt)
    else:
        print("warning: no --torch_ckpt — exporting randomly-initialized "
              "weights (smoke only)", file=sys.stderr)
        variables = zm.init(jax.random.PRNGKey(0),
                            image_size=args.image_size)
    exported = export_classifier(
        zm, variables, image_size=args.image_size,
        batch_sizes=[int(b) for b in args.bs.split(",") if b],
        norm=_norm_for(NORM_VALUES, args.dataset),
        platforms=None if not args.platforms else args.platforms.split(","),
        param_dtype=args.param_dtype, prequant=not args.no_prequant,
        num_devices=args.num_devices)
    save_bundle(args.out, exported)
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in sorted(os.listdir(args.out))}
    print(json.dumps({"out": args.out, "manifest": exported["manifest"],
                      "files_bytes": sizes}))


if __name__ == "__main__":
    main()
