from overseer_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
from overseer_spark.sources.maintenance import (  # noqa: F401
    compact,
    compaction_plan,
    file_profile,
)
from overseer_spark.sources.pydatasource import register as register_pydatasource  # noqa: F401
