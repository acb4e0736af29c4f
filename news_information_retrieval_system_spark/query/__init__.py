from .bm25 import bm25_topk, query_terms_df, score_bm25  # noqa: F401
from .bm25f import bm25f_topk, score_bm25f  # noqa: F401
from .champion import build_champion_lists, champion_topk  # noqa: F401
from .sdm import query_pairs_df, score_sdm, sdm_topk  # noqa: F401
