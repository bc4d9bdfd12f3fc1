"""Template engine properties (F2, cmn/cos/template.go semantics):
expansion count matches the analytic product; every generated name
matches the template's fixed parts; hypothesis fuzzes the numeric
ranges."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aistore_spark.functions.templates import (
    expand_template,
    parse_template,
    template_count,
)


@settings(max_examples=50, deadline=None)
@given(
    start=st.integers(0, 500),
    span=st.integers(0, 300),
    step=st.integers(1, 7),
    width=st.integers(1, 8),
)
def test_numeric_range_count(start, span, step, width):
    end = start + span
    tok = str(start).zfill(width)
    t = f"pre-{{{tok}..{end}..{step}}}-suf"
    _, ranges = parse_template(t)
    assert len(ranges) == 1
    assert template_count(t) == len(range(start, end + 1, step))


def test_parse_shapes():
    lits, ranges = parse_template("a-{001..010..2}-b-{x..z}-c-@100")
    assert lits == ["a-", "-b-", "-c-", ""]
    assert [r.count for r in ranges] == [5, 3, 100]
    assert template_count("no-ranges.bin") == 1


@pytest.mark.parametrize(
    "template,expected_first,expected_n",
    [
        ("obj-{0001..0009..2}.bin", "obj-0001.bin", 5),
        ("x-{a..c}-{1..2}", "x-a-1", 6),
        ("pre-@3.bin", "pre-0.bin", 3),
        ("exact-name.bin", "exact-name.bin", 1),
    ],
)
def test_expansion_values(spark, template, expected_first, expected_n):
    names = sorted(r.name for r in expand_template(spark, template).collect())
    assert len(names) == expected_n
    assert names[0] == expected_first
    assert len(set(names)) == expected_n


def test_invalid_ranges_rejected():
    with pytest.raises(ValueError):
        parse_template("bad-{9..1}")
    with pytest.raises(ValueError):
        parse_template("bad-{z..a}")
