"""Fixture management: decoded reference PBFs + deterministic synthetics.

- `ensure_fixture(name)` decodes `/root/reference/tests/data/<name>.pbf`
  into cached Parquet entity tables under `<repo>/.fixtures/<name>/`.
- `load_entities(spark, dir)` loads the canonical nodes/ways/relations
  tables as DataFrames.
- `synth_pages(...)` builds the Common-Crawl-style page table from
  BASELINE.json input_hint (url, warc_ts, html, text, lang) fully
  deterministically (seed=42, no wall clock, no external data).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..operators.closure import EntityTables

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE_CACHE = os.path.join(_REPO_ROOT, ".fixtures")
REFERENCE_DATA = "/root/reference/tests/data"


def ensure_fixture(name: str) -> str:
    """Decode tests/data/<name>.pbf → parquet (cached). Returns dir path."""
    out_dir = os.path.join(FIXTURE_CACHE, name)
    marker = os.path.join(out_dir, "relations.parquet")
    if not os.path.exists(marker):
        from .pbf import pbf_to_parquet

        pbf_to_parquet(os.path.join(REFERENCE_DATA, f"{name}.pbf"), out_dir)
    return out_dir


def load_entities(spark: SparkSession, dir_path: str) -> EntityTables:
    return EntityTables(
        nodes=spark.read.parquet(os.path.join(dir_path, "nodes.parquet")),
        ways=spark.read.parquet(os.path.join(dir_path, "ways.parquet")),
        relations=spark.read.parquet(os.path.join(dir_path, "relations.parquet")),
    )


def load_fixture(spark: SparkSession, name: str) -> EntityTables:
    return load_entities(spark, ensure_fixture(name))


# --- Common-Crawl-style page table (graft input) ---------------------------

_LANGS = ("en", "de", "fr", "es", "it", "pt", "nl", "pl")

_HTML_TEMPLATE = (
    "<!DOCTYPE html><html lang=\"{lang}\"><head><title>{title}</title>"
    "<meta charset=\"utf-8\"></head><body><nav>home | about</nav>"
    "<article><h1>{title}</h1><p>{text}</p></article>"
    "<footer>crawl fixture</footer></body></html>"
)


def _page_row(i: int) -> tuple:
    import hashlib

    h = hashlib.sha256(f"page-{i}".encode()).hexdigest()
    url = f"https://example-{int(h[:4], 16) % 500}.test/page/{i}"
    lang = _LANGS[int(h[4:6], 16) % len(_LANGS)]
    title = f"Document {i}"
    words = [f"w{h[j : j + 2]}" for j in range(0, 40, 2)]
    text = f"{title}\n" + " ".join(words)
    html = _HTML_TEMPLATE.format(lang=lang, title=title, text=" ".join(words)).encode()
    # deterministic timestamp derived from the row index — no now()
    ts = 1_600_000_000 + (i * 137) % 86_400_000
    return (url, ts, html, text, lang)


def synth_pages(spark: SparkSession, n: int = 1000):
    """Deterministic page table matching BASELINE.json input_hint schema."""
    import pyspark.sql.functions as F

    rows = [_page_row(i) for i in range(n)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts_s long, html binary, text string, lang string"
    )
    return df.select(
        "url",
        F.timestamp_seconds("warc_ts_s").alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
