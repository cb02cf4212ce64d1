from overseer_spark.operators.scheduling import (  # noqa: F401
    dead_jobs,
    direct_dependents,
    ready_jobs,
    transitive_dependents,
)
from overseer_spark.operators.observe import (  # noqa: F401
    gate,
    with_quality_metrics,
)
