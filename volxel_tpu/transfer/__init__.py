from volxel_tpu.transfer.function import (  # noqa: F401
    generate_transfer_function,
    parse_transfer_function,
    DEFAULT_COLOR_STOPS,
)
