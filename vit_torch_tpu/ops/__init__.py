from vit_torch_tpu.ops.attention import dot_product_attention
from vit_torch_tpu.ops.flash_attention import flash_attention
from vit_torch_tpu.ops.fused_mlp import fused_mlp
from vit_torch_tpu.ops.ring_attention import ring_attention
from vit_torch_tpu.ops.window_attention import window_attention
from vit_torch_tpu.ops.window_block import window_block
