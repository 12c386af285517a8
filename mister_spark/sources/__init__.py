from mister_spark.sources.io import READERS, WRITERS, read, write

__all__ = ["READERS", "WRITERS", "read", "write"]
