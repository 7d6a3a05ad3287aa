"""Corpus-level text analytics for the training-data pipeline.

Everything here is pure Catalyst (no Python in the data path):

- `tfidf_top_terms`: per-document top-k terms by tf-idf. TF/DF are two
  partial-aggregated groupBys over the exploded token table; the corpus
  size joins in as a broadcast 1-row aggregate (never a driver
  `count()` round-trip), and top-k is a window with a deterministic
  tiebreak. At 10¹² docs the only large shuffles are the two token
  aggregations, both map-side combined.
- `source_stats`: per-source (domain analog) corpus triage — doc count,
  exact-dup rate via normalized-text fingerprints, mean token count,
  language spread. One groupBy over the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..functions.text import fingerprint, normalize, token_count


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc id, term, tf, round(tfidf, 6), rank<=k); idf = ln((N+1)/(df+1))+1
    (smoothed), ties broken by term ascending for determinism."""
    from ..plans.partitioning import widen_narrow_input

    toks = (
        widen_narrow_input(df)
        .select(F.col(id_col).alias("id"), F.explode(F.split(normalize(F.col(text_col)), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


def source_stats(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus triage: (source, n_docs, n_unique, dup_rate,
    avg_tokens, n_langs)."""
    return df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(fingerprint(F.col(text_col))).alias("n_unique"),
        F.round(
            1.0 - F.count_distinct(fingerprint(F.col(text_col))) / F.count("*"), 6
        ).alias("dup_rate"),
        F.round(F.avg(token_count(F.col(text_col))), 6).alias("avg_tokens"),
        F.count_distinct(F.col(lang_col)).alias("n_langs"),
    )
