from volxel_tpu.grid.encoding import (  # noqa: F401
    decode_ptr,
    decode_range,
    decode_voxel,
    encode_ptr,
    encode_range,
    encode_voxel,
    f16_round,
    BRICK_SIZE,
    BITS_PER_AXIS,
    MAX_BRICKS,
    NUM_MIPMAPS,
)
from volxel_tpu.grid.brick import BrickGrid, construct_brick_grid  # noqa: F401
