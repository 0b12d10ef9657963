from search_replica_spark.analysis.tokenizer import (
    tokenize_series,
    tokenize_text,
)

__all__ = ["tokenize_series", "tokenize_text"]
