"""Text-analysis operators for training-data pipelines.

Language ID (stopword-ratio heuristic), quality scoring, token counting,
and document fingerprinting — all pure column expressions (whole-stage
codegen, zero shuffles, zero UDFs), so they run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to")


def lang_id(df: DataFrame, id_col: str, text_col: str, min_ratio: float = 0.05) -> DataFrame:
    """N-gram-free language ID heuristic: English stopword token ratio."""
    tok = F.split(F.col(text_col), " ")
    n_stop = F.size(F.filter(tok, lambda t: t.isin(*EN_STOPWORDS)))
    ratio = F.round(n_stop / F.size(tok).cast("double"), 4)
    return df.select(
        F.col(id_col),
        ratio.alias("stop_ratio"),
        F.when(ratio >= min_ratio, "en").otherwise("unk").alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Cheap quality heuristics: token count, lexical diversity, mean token
    length, and a blended score. All integer-derived arithmetic, so the
    values are exactly reproducible."""
    tok = F.split(F.col(text_col), " ")
    n_tok = F.size(tok)
    n_uniq = F.size(F.array_distinct(tok))
    uniq_ratio = F.round(n_uniq / n_tok.cast("double"), 4)
    avg_len = F.round(
        (F.length(text_col) - (n_tok - 1)) / n_tok.cast("double"), 4
    )
    score = F.round(
        0.5 * (n_uniq / n_tok.cast("double"))
        + 0.5 * F.least(F.lit(1.0), n_tok / F.lit(100.0)),
        4,
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        uniq_ratio.alias("uniq_ratio"),
        avg_len.alias("avg_token_len"),
        score.alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish alnum-run count (regex)."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[a-z0-9]+', 0)")).alias(
            "n_word_runs"
        ),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set — the classic shingle-set fingerprint for exact near-dup
    grouping after token normalization."""
    tok = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(F.array_sort(F.array_distinct(tok)), " ")).alias(
            "fingerprint"
        ),
    )
