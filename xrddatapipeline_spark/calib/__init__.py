from xrddatapipeline_spark.calib.geometry import ImageControls, compute_maps_numpy  # noqa: F401
from xrddatapipeline_spark.calib.cache import build_calib_pixels  # noqa: F401
