from cortex_spark.functions.similarity import cosine_col, dot_col, jaccard_words_col, l2_norm_col
from cortex_spark.functions.scoring import decay_weight_col, score_decay_col, hybrid_score_col
from cortex_spark.functions.text import (
    has_negation_col,
    lang_id_col,
    quality_score_col,
    token_count_col,
    fingerprint_col,
)

__all__ = [
    "cosine_col",
    "dot_col",
    "l2_norm_col",
    "jaccard_words_col",
    "decay_weight_col",
    "score_decay_col",
    "hybrid_score_col",
    "has_negation_col",
    "lang_id_col",
    "quality_score_col",
    "token_count_col",
    "fingerprint_col",
]
