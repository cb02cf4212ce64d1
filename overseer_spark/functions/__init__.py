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
