"""overseer_spark — a PySpark-native pipeline/analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
framed-data/overseer reference (a Clojure DAG-pipeline library): jobs and
dependencies are DataFrames, scheduling queries are joins/anti-joins, the
status FSM is a set of CAS-style conditional writes, and the handler-side
compute surface is a first-class, tested operator library (relational ops,
window/rollup/set ops, plus LLM-data-pipeline operators: dedup, similarity
search, text analysis, multimodal column plumbing).

Design stance (SURVEY.md §7): declare logical plans with the DataFrame/SQL
API and let Catalyst/Tungsten/AQE pick physical strategies; Python UDFs only
where built-ins genuinely cannot express the semantics (always Arrow-batched
pandas UDFs, never per-row).
"""

__version__ = "0.1.0"

from overseer_spark.core import (  # noqa: F401
    STATUS_ABORTED,
    STATUS_FAILED,
    STATUS_FINISHED,
    STATUS_STARTED,
    STATUS_UNSTARTED,
    Job,
    job_graph,
    squuid,
)
from overseer_spark.errors import Abort, AbortSilent, Fault  # noqa: F401
