from volxel_tpu.scene.camera import Camera  # noqa: F401
from volxel_tpu.scene.volume import Volume  # noqa: F401
from volxel_tpu.scene.environment import (  # noqa: F401
    Environment,
    default_environment,
)
