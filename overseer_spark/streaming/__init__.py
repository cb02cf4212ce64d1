from overseer_spark.streaming.scheduler import StreamingWorker  # noqa: F401
from overseer_spark.streaming.windows import (  # noqa: F401
    session_counts,
    sliding_counts,
    tumbling_counts,
)
