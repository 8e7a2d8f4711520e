from raisin_tpu.parallel.blocks import (  # noqa: F401
    compress_container,
    decompress_container,
    DEFAULT_BLOCK_SIZE,
)
from raisin_tpu.parallel.mesh import data_mesh, best_mesh  # noqa: F401
