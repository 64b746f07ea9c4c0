from volxel_tpu.native.loader import get_native, native_available  # noqa: F401
