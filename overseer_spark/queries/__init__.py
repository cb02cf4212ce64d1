from overseer_spark.queries.catalog import CATALOG, QuerySpec  # noqa: F401
