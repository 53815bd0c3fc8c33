from xrddatapipeline_spark.sources.tables import load_tables, TABLE_NAMES  # noqa: F401
