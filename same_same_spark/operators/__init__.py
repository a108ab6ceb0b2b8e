from same_same_spark.operators.filters import (  # noqa: F401
    compile_filters,
    matches_metadata,
)
from same_same_spark.operators.temporal import (  # noqa: F401
    DECAY_LAMBDAS,
    age_col,
    decay_factor_col,
    resolve_doc_time,
)
from same_same_spark.operators.tags import (  # noqa: F401
    split_tags_col,
    split_tags_sql,
)
from same_same_spark.operators.vector import (  # noqa: F401
    cosine_col,
    euclidean_col,
    search_by_embedding,
)
