from xrddatapipeline_spark.operators.ring_stats import group_median_mad, flag_outliers  # noqa: F401
from xrddatapipeline_spark.operators.integrate import integrate_binned_mean  # noqa: F401
