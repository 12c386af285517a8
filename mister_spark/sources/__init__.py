from mister_spark.sources.compact import compact, dir_bytes
from mister_spark.sources.io import READERS, WRITERS, read, write

__all__ = ["READERS", "WRITERS", "read", "write", "compact", "dir_bytes"]
