"""Filter-DSL parse + compile tests, porting the reference matrix
(/root/reference/src/lib/filter.rs:86-216 and the doc test at
filter.rs:50-59)."""

import pyspark.sql.functions as F
import pytest

from osm_pbf2json_spark.functions.filter_dsl import (
    Condition,
    Group,
    build_admin_groups,
    build_street_groups,
    compile_groups,
    parse,
)


def test_parse_single_group():
    assert parse("amenity") == [Group((Condition("amenity"),))]


def test_parse_multiple_groups():
    assert parse("amenity,highway") == [
        Group((Condition("amenity"),)),
        Group((Condition("highway"),)),
    ]


def test_parse_multiple_conditions():
    assert parse("amenity+highway") == [
        Group((Condition("amenity"), Condition("highway")))
    ]


def test_parse_value_match():
    assert parse("amenity~theatre") == [Group((Condition("amenity", "theatre"),))]


def test_parse_doc_example():
    groups = parse("amenity~fountain+tourism,amenity~townhall")
    assert len(groups) == 2
    assert len(groups[0].conditions) == 2


def test_parse_value_containing_tilde():
    # splitn(2,'~'): value may contain '~' (filter.rs:25)
    assert parse("note~a~b") == [Group((Condition("note", "a~b"),))]


def test_parse_empty_value():
    assert parse("name~") == [Group((Condition("name", ""),))]


def _matches(spark, tags: dict, selector: str) -> bool:
    df = spark.createDataFrame([(tags,)], "tags map<string,string>")
    return df.filter(compile_groups(parse(selector))).count() == 1


@pytest.mark.parametrize(
    "tags,selector,expected",
    [
        ({}, "amenity", False),
        ({"amenity": "theatre"}, "amenity", True),
        ({"amenity": "theatre"}, "amenity~theatre", True),
        ({"amenity": "cinema"}, "amenity~theatre", False),
        # multiple groups = OR (filter.rs:138-152)
        ({"amenity": "theatre", "name": "Waldbühne"}, "amenity,architect", True),
        # multiple conditions = AND (filter.rs:154-173)
        ({"amenity": "theatre", "name": "Waldbühne"}, "amenity+name", True),
        ({"amenity": "theatre", "name": "Waldbühne"}, "name+architect", False),
        # missing key in value match is not an error, just false
        ({"other": "x"}, "amenity~x", False),
    ],
)
def test_filter_matrix(spark, tags, selector, expected):
    assert _matches(spark, tags, selector) is expected


def test_street_groups_shape():
    groups = build_street_groups(None)
    assert len(groups) == 7
    assert groups[0].conditions[0] == Condition("highway", "primary")
    # no name given → presence condition (mod.rs:100)
    assert groups[0].conditions[1] == Condition("name", None)


def test_admin_groups_default_levels():
    groups = build_admin_groups()
    assert [g.conditions[1].value for g in groups] == ["4", "6", "8", "9", "10"]


def test_empty_groups_is_match_all(spark):
    df = spark.createDataFrame([({},)], "tags map<string,string>")
    assert df.filter(compile_groups([])).count() == 1


def test_compile_pushdown_shape(spark):
    """The compiled predicate stays a pure Column expression (codegen-able,
    no Python UDF)."""
    col = compile_groups(parse("amenity~fountain+tourism,amenity~townhall"))
    df = spark.createDataFrame([({"a": "b"},)], "tags map<string,string>").filter(col)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan
