from tsdownsample_spark.operators.asof import asof_join  # noqa: F401
from tsdownsample_spark.operators.downsample import (  # noqa: F401
    downsample_series,
    downsample_tokens,
    downsample_tokens_multi,
    downsample_tokens_pyramid,
    gather_values,
)
from tsdownsample_spark.operators.evaluate import downsample_error  # noqa: F401
from tsdownsample_spark.operators.gaps import detect_gaps  # noqa: F401
from tsdownsample_spark.operators.rate import (  # noqa: F401
    counter_rate,
    time_weighted_avg,
)
from tsdownsample_spark.operators.rollup import (  # noqa: F401
    quantile_tier,
    retention_tiers,
)
