from mister_spark.sources.compact import compact, dir_bytes
from mister_spark.sources.io import READERS, WRITERS, read, write
from mister_spark.sources.zorder import write_zordered, zvalue

__all__ = [
    "READERS",
    "WRITERS",
    "read",
    "write",
    "compact",
    "dir_bytes",
    "write_zordered",
    "zvalue",
]
