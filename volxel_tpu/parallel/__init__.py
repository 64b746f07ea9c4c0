from volxel_tpu.parallel.mesh import make_mesh  # noqa: F401
from volxel_tpu.parallel.multihost import (  # noqa: F401
    initialize_multihost,
    process_info,
)
from volxel_tpu.parallel.shard import (  # noqa: F401
    render_sample_sharded,
    sharded_render_fn,
)
