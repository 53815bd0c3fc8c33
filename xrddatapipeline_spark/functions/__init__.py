from xrddatapipeline_spark.functions.trig import (  # noqa: F401
    sind, cosd, tand, asind, acosd, atand, atan2d,
    tth_to_q, q_to_tth, tth_to_d,
)
from xrddatapipeline_spark.functions.binning import (  # noqa: F401
    tth_bin_index, q_bin_index, azim_band, in_circular_range,
)
