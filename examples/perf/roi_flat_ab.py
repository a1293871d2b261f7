"""A/B the two shipped detection-path rewrites on the FRCNN train step
(512px/bs8 resnext50-FPN — the detection-bench config):

- VITX_ROI_FLAT:      flat-gather RoIAlign vs all-levels blend
                      (`frcnn_step_decompose.json` put RoIAlign at 30.6%
                      of the step under the blend lowering)
- VITX_DENSE_GROUPS:  block-diagonal dense grouped convs vs XLA grouped
                      (`resnext_ablation.json` — classification lever;
                      the FRCNN backbone is the same resnext50)

Four combos, slope-timed via the production `_train_chunk` (same harness
as frcnn_step_decompose).  Writes examples/perf/roi_flat_ab.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from frcnn_step_decompose import BS, SIZE, _batch, _build, time_step  # noqa: E402


def main() -> None:
    import jax
    rows = []
    out_fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "roi_flat_ab.json")
    batch = _batch()
    for flat in ("1", "0"):
        for dense in ("1", "0"):
            os.environ["VITX_ROI_FLAT"] = flat
            os.environ["VITX_DENSE_GROUPS"] = dense
            trainer = _build()
            ms = time_step(trainer, batch) * 1e3
            row = {"roi_flat": flat, "dense_groups": dense,
                   "ms_per_step": round(ms, 2),
                   "img_per_sec": round(BS / ms * 1e3, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out_fp, "w") as f:
                json.dump({"device": jax.devices()[0].device_kind,
                           "size": SIZE, "bs": BS, "rows": rows}, f,
                          indent=1)
    print("saved", out_fp, flush=True)


if __name__ == "__main__":
    main()
