from .bm25 import bm25_topk, query_terms_df, score_bm25  # noqa: F401
