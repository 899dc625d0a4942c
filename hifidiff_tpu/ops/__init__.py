from hifidiff_tpu.ops.norm import layer_norm_2d
from hifidiff_tpu.ops.gates import simple_gate
from hifidiff_tpu.ops.pixel_shuffle import pixel_shuffle
from hifidiff_tpu.ops.embedding import sinusoidal_time_embed
from hifidiff_tpu.ops.warp import affine_grid, grid_sample, affine_warp
from hifidiff_tpu.ops.resize import resize_bicubic_torch

__all__ = [
    "layer_norm_2d",
    "simple_gate",
    "pixel_shuffle",
    "sinusoidal_time_embed",
    "affine_grid",
    "grid_sample",
    "affine_warp",
    "resize_bicubic_torch",
]
