from tsdownsample_spark.streaming.checkpoint import PartitionedJob  # noqa: F401
