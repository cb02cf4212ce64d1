from overseer_spark.plans.inspect import (  # noqa: F401
    exchange_count,
    explain_str,
    has_broadcast_join,
    has_cartesian_or_bnlj,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
    uses_take_ordered,
    wholestage_codegen_spans,
)
