from grpc_map_reduce_spark.functions.text import TOKEN_SPLIT_RE, tokens, words
from grpc_map_reduce_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["TOKEN_SPLIT_RE", "tokens", "words", "cosine_similarity", "dot", "l2_norm"]
