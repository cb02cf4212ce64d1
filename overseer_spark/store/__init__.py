from overseer_spark.store.base import Store  # noqa: F401
from overseer_spark.store.memory import MemoryStore  # noqa: F401
from overseer_spark.store.sparklog import SparkLogStore  # noqa: F401
from overseer_spark.store.filecas import FileCASStore  # noqa: F401
