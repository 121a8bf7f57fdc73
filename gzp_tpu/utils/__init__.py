from gzp_tpu.utils.serialize import put_le, put_be, put_pairs  # noqa: F401
