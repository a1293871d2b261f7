from vit_torch_tpu.checkpoint.orbax_io import (
    save_checkpoint, restore_checkpoint, latest_step,
)
from vit_torch_tpu.checkpoint.torch_import import (
    load_pretrained_params, load_torch_state_dict, import_backbone,
)
