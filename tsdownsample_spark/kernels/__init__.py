from tsdownsample_spark.kernels.binning import equal_count_bins, equidistant_bins  # noqa: F401
from tsdownsample_spark.kernels.selectors import (  # noqa: F401
    downsample_array,
    everynth,
    lttb,
    m4,
    minmax,
    minmaxlttb,
)
