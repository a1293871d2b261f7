"""Importers vs the published checkpoint layouts (constructor-derived).

CAVEAT: the manifests are derived from the reference's released model
constructors, not from hash-verified downloads of the ``.pth`` files (no
egress in this environment) — see ``fixtures/gen_ckpt_manifests.py``.

`test_ckpt_fixtures.py` proves the importers round-trip locally-built
torch mini-models.  This suite pins them to the actual published
checkpoints' key/shape manifests (``fixtures/ckpt_manifests.json``,
derived from the reference's own model constructors — see
``fixtures/gen_ckpt_manifests.py`` for the file:line provenance):

1. the importer consumes ONLY keys the real checkpoint contains (a key
   lookup outside the manifest = KeyError = the mini-model approximation
   drifted from reality);
2. it produces EVERY leaf of our full-size flax model with the correct
   shape (via the importer's own ``_check_tree_shapes`` gate against a
   ``jax.eval_shape`` target tree — no full-size params materialized);
3. every manifest key it leaves unconsumed is on the documented ignore
   list (classifier heads, recomputed buffers) — nothing silently drops.
"""

from __future__ import annotations

import functools
import json
import os
import re

import jax
import numpy as np
import pytest

from vit_torch_tpu.checkpoint import torch_import as ti
from vit_torch_tpu.models import VisionModelZoo

_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "ckpt_manifests.json")
with open(_FIXTURE) as f:
    MANIFESTS = json.load(f)

# keys the published checkpoints carry that the importers intentionally
# skip: classifier heads (the reference replaces them too — e.g.
# models/swin.py:836 loads strict=False over a num_classes=0 model) and
# buffers our models recompute (Swin index/mask tables, BN step counters)
_IGNORED = [
    re.compile(p) for p in (
        r"^head\.", r"^head_dist\.", r"^fc\.",
        r"\.num_batches_tracked$",
        r"\.relative_position_index$", r"\.attn_mask$",
    )
]


class _RecordingDict(dict):
    """Dict that records every key actually read by the importer."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


def _manifest_sd(man):
    # np.zeros is calloc-backed and the importers mostly take transpose
    # VIEWS, so even the swin_large manifest costs ~no physical memory
    return _RecordingDict({k: np.zeros(shape, dtype)
                           for k, (shape, dtype) in man["keys"].items()})


def _target_tree(man):
    zm = VisionModelZoo.get_model(man["arch"], classifier=None,
                                  image_size=man["image_size"])
    init = functools.partial(zm.init, jax.random.PRNGKey(0),
                             image_size=man["image_size"])
    return jax.eval_shape(init)


@pytest.mark.parametrize("name", sorted(MANIFESTS))
def test_importer_consumes_published_layout(name):
    man = MANIFESTS[name]
    sd = _manifest_sd(man)
    variables = _target_tree(man)
    target = variables["params"]["backbone"]

    imported = ti._FAMILY_IMPORTERS[man["family"]](sd, target)
    if man["family"] in ti._MULTI_COLLECTION:
        ti._check_tree_shapes(imported["params"], target, name)
        ti._check_tree_shapes(imported["batch_stats"],
                              variables["batch_stats"]["backbone"],
                              f"{name}:batch_stats")
    else:
        ti._check_tree_shapes(imported, target, name)

    unconsumed = set(man["keys"]) - sd.accessed
    leftovers = [k for k in unconsumed
                 if not any(p.search(k) for p in _IGNORED)]
    assert not leftovers, (
        f"{name}: published-checkpoint keys the importer silently "
        f"dropped: {sorted(leftovers)[:10]}")
    # and the ignore list is not vacuous — checkpoints that carry
    # ignorable keys (heads/buffers) must actually have skipped some
    # (DINO backbone dumps have none: the importer consumes 100%)
    has_ignorable = any(p.search(k) for k in man["keys"]
                        for p in _IGNORED)
    assert bool(unconsumed) == has_ignorable, (
        f"{name}: unconsumed={sorted(unconsumed)[:5]}")


@pytest.mark.parametrize("name", sorted(MANIFESTS))
def test_importer_reads_only_published_keys(name):
    """Every key the importer READS exists in the published layout with
    the manifest shape (lookups outside the manifest raise KeyError in
    the consume test; here assert the access set is non-trivial and
    fully contained)."""
    man = MANIFESTS[name]
    sd = _manifest_sd(man)
    target = _target_tree(man)["params"]["backbone"]
    ti._FAMILY_IMPORTERS[man["family"]](sd, target)
    assert sd.accessed <= set(man["keys"])
    assert len(sd.accessed) > 20


@pytest.mark.parametrize("wrapper,module_prefix", [
    (None, False),          # DINO backbone / torchvision
    ("model", False),       # MSFT Swin, FB deit/xcit releases
    ("model", True),        # FB CaiT releases
    ("teacher", True),      # DINO full checkpoints
])
def test_state_dict_unwrap_variants(tmp_path, wrapper, module_prefix,):
    """``load_torch_state_dict`` strips every published wrapper/prefix
    combination down to bare backbone keys."""
    import torch
    keys = ["cls_token", "pos_embed", "blocks.0.attn.qkv.weight"]
    sd = {("module." if module_prefix else "") + k: torch.zeros(2, 2)
          for k in keys}
    obj = {wrapper: sd, "epoch": 7} if wrapper else sd
    fp = str(tmp_path / "ckpt.pth")
    torch.save(obj, fp)
    out = ti.load_torch_state_dict(fp)
    assert set(out) == set(keys)


def test_dino_full_checkpoint_backbone_subtree(tmp_path):
    """DINO *full* checkpoints nest ``module.backbone.*`` +
    ``module.head.*`` inside ``teacher`` — the loader must keep only the
    backbone subtree (reference loads the hub backbone)."""
    import torch
    sd = {"module.backbone.cls_token": torch.zeros(1, 1, 4),
          "module.backbone.norm.weight": torch.zeros(4),
          "module.head.mlp.0.weight": torch.zeros(8, 4)}
    fp = str(tmp_path / "full.pth")
    torch.save({"teacher": sd}, fp)
    out = ti.load_torch_state_dict(fp)
    assert set(out) == {"cls_token", "norm.weight"}


def test_manifest_generator_is_current():
    """The checked-in JSON must match the generator (prevents silent
    drift between the recorded manifests and their derivation)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "fixtures"))
    try:
        import gen_ckpt_manifests as gen
    finally:
        sys.path.pop(0)
    regenerated = json.loads(json.dumps(gen.MANIFESTS))  # normalize tuples
    assert regenerated == MANIFESTS
