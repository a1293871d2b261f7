from vit_torch_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from vit_torch_tpu.parallel.api import shard_train_fns, shard_batch
from vit_torch_tpu.parallel.partition import partition_specs, named_shardings
