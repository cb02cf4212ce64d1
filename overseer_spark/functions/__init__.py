from overseer_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    l2_norm,
    vec_dot,
)
from overseer_spark.functions.textfns import (  # noqa: F401
    char_ngrams,
    shingles,
    tokens,
)
from overseer_spark.functions.registry import register_all as register_sql_functions  # noqa: F401
