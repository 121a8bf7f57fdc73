from gzp_tpu.runtime.native_lib import NativeCodec, get_native  # noqa: F401
