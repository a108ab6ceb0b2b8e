from same_same_spark.index.build import IndexManifest, build_index  # noqa: F401
from same_same_spark.index.query import search, search_batch  # noqa: F401
