"""Tag-filter DSL: parse + compile to a Catalyst Column.

Reference semantics (`/root/reference/src/lib/filter.rs:24-83`):

- ``,`` separates groups (OR across groups)
- ``+`` separates conditions inside a group (AND within group)
- ``key~value`` is an exact value match; the split is ``splitn(2, '~')`` so
  the value may itself contain ``~``; an empty value ("key~") is legal and
  matches the empty string
- bare ``key`` is a tag-presence test

Instead of evaluating per row in Python (the reference walks a tags map per
object), we compile the whole expression once into a boolean Column in
disjunctive normal form; Catalyst folds it into whole-stage codegen and can
push parts of it into the Parquet scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
import pyspark.sql.functions as F


@dataclass(frozen=True)
class Condition:
    """``key`` presence test (value is None) or exact ``key~value`` match."""

    key: str
    value: str | None = None


@dataclass(frozen=True)
class Group:
    conditions: tuple[Condition, ...]


def parse_condition(condition_str: str) -> Condition:
    parts = condition_str.split("~", 1)  # splitn(2,'~') — filter.rs:25
    if len(parts) < 2:
        return Condition(condition_str, None)
    return Condition(parts[0], parts[1])


def parse(selector_str: str) -> list[Group]:
    """Parse ``amenity~fountain+tourism,amenity~townhall`` style selectors."""
    return [
        Group(tuple(parse_condition(c) for c in group_str.split("+")))
        for group_str in selector_str.split(",")
    ]


def compile_condition(cond: Condition, tags: Column) -> Column:
    if cond.value is None:
        # TagPresence — filter.rs:66
        return F.map_contains_key(tags, F.lit(cond.key))
    # ValueMatch — filter.rs:67; getItem on a missing key yields NULL which
    # compares to false, matching tags.contains(key, value)
    return tags.getItem(cond.key) == F.lit(cond.value)


def compile_groups(groups: list[Group], tags: Column | None = None) -> Column:
    """DNF compile: OR over groups of AND over conditions (filter.rs:71-83)."""
    tags = tags if tags is not None else F.col("tags")
    if not groups:
        return F.lit(True)
    group_cols = []
    for g in groups:
        col = F.lit(True)
        for c in g.conditions:
            col = col & compile_condition(c, tags)
        group_cols.append(col)
    out = group_cols[0]
    for col in group_cols[1:]:
        out = out | col
    # NULL-safe: a row whose tags lack the key yields NULL; treat as no-match
    return F.coalesce(out, F.lit(False))


def compile_selector(selector_str: str, tags: Column | None = None) -> Column:
    return compile_groups(parse(selector_str), tags)


STREET_HIGHWAY_VALUES = (
    # build_street_group — /root/reference/src/lib/mod.rs:89-109
    "primary",
    "secondary",
    "tertiary",
    "residential",
    "service",
    "living_street",
    "pedestrian",
)

DEFAULT_ADMIN_LEVELS = (4, 6, 8, 9, 10)  # mod.rs:132-133


def build_street_groups(name: str | None = None) -> list[Group]:
    """7 OR-groups: highway~<v> (+ name~<name> | name-presence) — mod.rs:89-109.

    Note the reference uses ``Condition::new("name", name)`` which degrades
    to a *presence* test when no name is given, so unnamed highways are
    filtered out up front.
    """
    name_cond = Condition("name", name)
    return [
        Group((Condition("highway", v), name_cond)) for v in STREET_HIGHWAY_VALUES
    ]


def build_admin_groups(levels=None) -> list[Group]:
    """Per level: boundary~administrative + admin_level~<l> — mod.rs:77-87."""
    levels = levels if levels is not None else DEFAULT_ADMIN_LEVELS
    return [
        Group((Condition("boundary", "administrative"), Condition("admin_level", str(l))))
        for l in levels
    ]
