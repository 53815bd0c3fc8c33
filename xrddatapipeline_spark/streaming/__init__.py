from xrddatapipeline_spark.streaming.pipeline import (  # noqa: F401
    PIXEL_SCHEMA,
    StreamingImagePipeline,
    read_pixel_stream,
)
