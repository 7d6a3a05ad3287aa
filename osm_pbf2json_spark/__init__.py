"""osm_pbf2json_spark — a from-scratch PySpark-native spatial-join +
tiling engine with the query surface of mkulke/osm-pbf2json.

Public API (mirrors the reference CLI subcommands, `main.rs:10-40`):

    from osm_pbf2json_spark import objects, streets, boundaries, parse
    tables = load_fixture(spark, "alexanderplatz")
    df = objects(tables, "amenity~fountain+tourism,amenity~townhall")

plus the graft layer: spatial joins (`operators.spatial`), dedup
(`operators.dedup`), ANN (`operators.ann`), text analysis
(`functions.text`), tiling (`functions.tiles`), page pipeline
(`sources.pages`), lineage/restart (`plans.lineage`).
"""

from .functions.filter_dsl import compile_groups, compile_selector, parse
from .operators.boundaries import boundaries
from .operators.closure import EntityTables
from .operators.objects import objects
from .operators.streets import streets
from .session import get_session
from .sources.fixtures import load_entities, load_fixture

__all__ = [
    "EntityTables",
    "boundaries",
    "compile_groups",
    "compile_selector",
    "get_session",
    "load_entities",
    "load_fixture",
    "objects",
    "parse",
    "streets",
]

__version__ = "0.1.0"
