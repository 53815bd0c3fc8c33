"""xrddatapipeline_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of AdvancedPhotonSource/XRDdatapipeline.

Architecture is Spark-first (DataFrame/SQL/Catalyst/Structured Streaming),
NOT a port of the reference's numpy/C/Fortran execution engine:

- Per-pixel data lives in long-form DataFrames (``pixels``: one row per
  detector pixel) instead of dense 2-D arrays; calibration maps become a
  ``calib_pixels`` table joined on (y, x).
- Every per-pixel scalar map (2theta / azimuth / Q / polarization / bin
  indices) is a Catalyst ``Column`` expression, so it stays inside
  whole-stage codegen.
- The hash-agg shaped operators of the reference (ring median/MAD outlier
  masking, azimuthal integration, spot/arc classification, spottiness
  statistics) are ``groupBy().agg`` plans.
- Raster-neighborhood operators with no relational analog (connected
  components, morphology, gradient convolution) run as per-image
  ``applyInPandas`` kernels (Arrow-batched), the one place Python touches
  the hot path.
- Streaming ingest is Structured Streaming file-source + ``foreachBatch``.

Reference parity citations appear in each module's docstring as
``reference-file:line`` relative to the studied snapshot.
"""

__version__ = "0.1.0"

from xrddatapipeline_spark.session import get_spark  # noqa: F401
