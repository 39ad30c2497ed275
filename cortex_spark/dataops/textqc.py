"""Text-analysis profile over a document corpus (language ID, quality,
token counts, fingerprints) — all native column exprs, one scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cortex_spark.functions.text import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    subword_estimate_col,
    token_count_col,
)


def text_quality_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count_col(t).alias("n_tokens"),
        subword_estimate_col(t).alias("n_subwords_est"),
        F.length(t).alias("n_chars_measured"),
        lang_id_col(t).alias("lang_pred"),
        quality_score_col(t).alias("quality"),
        fingerprint_col(t).alias("fingerprint"),
    )
