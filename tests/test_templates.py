"""Template engine properties (F2, cmn/cos/template.go semantics):
expansion count matches the analytic product; every generated name
matches the template's fixed parts; hypothesis fuzzes the numeric
ranges."""

from __future__ import annotations

import re

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
    # '@100' is END-INCLUSIVE per ParseAtTemplate (template.go:408-441):
    # Start=0, End=100, DigitCount=3 -> 101 names '000'..'100'.
    assert [r.count for r in ranges] == [5, 3, 101]
    assert template_count("no-ranges.bin") == 1


def test_at_template_inclusive_end(spark):
    names = sorted(r.name for r in expand_template(spark, "p-@100").collect())
    assert len(names) == 101
    assert names[0] == "p-000"
    assert names[-1] == "p-100"


def test_bash_width_is_min_of_tokens():
    # parseBashRangeNumbers: DigitCount = min(len(start), len(end))
    _, ranges = parse_template("x-{001..10}")
    assert ranges[0].width == 2


def test_fmt_template_matcher(spark):
    from aistore_spark.functions.templates import has_fmt_range, template_regex

    t = "pre-%06d-suf"
    assert has_fmt_range(t)
    rx = re.compile(template_regex(t))
    assert rx.match("pre-000000-suf")
    assert rx.match("pre-123456-suf")
    assert rx.match("pre-1234567-suf")  # values >= 10^6 render wider
    assert not rx.match("pre-12345-suf")  # fewer than 6 digits impossible
    assert not rx.match("pre--suf")
    with pytest.raises(ValueError):
        expand_template(spark, t)  # unbounded — must refuse loudly
    with pytest.raises(ValueError):
        template_count(t)
    # bare %d: at least one digit, no padding floor
    rx2 = re.compile(template_regex("a%db"))
    assert rx2.match("a7b") and not rx2.match("ab")
    # multiple '%' directives are invalid (template.go:265-267)
    with pytest.raises(ValueError):
        parse_template("a-%02d-%03d")


@pytest.mark.parametrize(
    "template,expected_first,expected_n",
    [
        ("obj-{0001..0009..2}.bin", "obj-0001.bin", 5),
        ("x-{a..c}-{1..2}", "x-a-1", 6),
        ("pre-@3.bin", "pre-0.bin", 4),
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
