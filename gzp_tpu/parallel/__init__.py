from gzp_tpu.parallel.builder import ZBuilder, SyncZBuilder  # noqa: F401
from gzp_tpu.parallel.compress import ParCompress, ParCompressBuilder  # noqa: F401
