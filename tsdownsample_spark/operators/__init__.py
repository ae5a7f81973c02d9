from tsdownsample_spark.operators.downsample import (  # noqa: F401
    downsample_series,
    downsample_tokens,
    gather_values,
)
