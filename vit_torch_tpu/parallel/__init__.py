from vit_torch_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from vit_torch_tpu.parallel.api import shard_train_fns, shard_batch
from vit_torch_tpu.parallel.partition import partition_specs, named_shardings
from vit_torch_tpu.parallel.pipeline import (
    pipeline_apply, stack_params, unstack_params, split_vit_params,
    merge_vit_params, vit_pipeline_features, build_pipeline_classifier,
)
