from xrddatapipeline_spark.plans.driver_queries import REGISTRY, QueryDef  # noqa: F401
