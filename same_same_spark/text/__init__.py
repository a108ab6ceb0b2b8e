from same_same_spark.text.tokenizer import (  # noqa: F401
    STOPWORDS,
    tokenize_py,
    tokens_col,
    tokenize_pandas_udf,
    duckdb_tokens_sql,
)
