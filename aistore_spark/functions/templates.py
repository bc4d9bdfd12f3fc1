"""Brace-range template expansion (the reference's F2 predicate).

The reference accepts bash-brace templates naming object sets:
``prefix-{0001..0010..2}-suffix`` (numeric, optional step, zero-padded
to the start token's width), multiple ranges per template, single-char
alpha ranges ``{a..z}``, and the at-style shorthand ``prefix-@100``
(= ``{000..099}``). Behavior per ``cmn/cos/template.go:32-142`` and its
usage in ``api/apc/multiobj.go:16-28`` (ListRange) — re-implemented
from the documented surface, not ported.

Spark-first: a template expands to a *generated* DataFrame
(``spark.range`` cross-joined per range segment — no data read, no
shuffle), which then semi-joins the catalog. At 100 TB that join
broadcasts the generated name set when small, or hash-joins when a
template names millions of objects; either way the catalog scan prunes
on the template's literal prefix.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RANGE = re.compile(
    r"\{(?:(\d+)\.\.(\d+)(?:\.\.(\d+))?|([a-zA-Z])\.\.([a-zA-Z]))\}|@(\d+)"
)


@dataclass(frozen=True)
class RangeSpec:
    start: int
    end: int  # inclusive
    step: int
    width: int  # zero-pad width; 0 = no padding
    alpha: bool = False

    @property
    def count(self) -> int:
        return (self.end - self.start) // self.step + 1


def parse_template(template: str) -> tuple[list[str], list[RangeSpec]]:
    """Split *template* into literal pieces and range specs.

    Returns ``(literals, ranges)`` with ``len(literals) == len(ranges)+1``.
    A template with no ranges is a single literal (= one exact name).
    """
    literals: list[str] = []
    ranges: list[RangeSpec] = []
    pos = 0
    for m in _RANGE.finditer(template):
        literals.append(template[pos : m.start()])
        pos = m.end()
        if m.group(6) is not None:  # @N shorthand
            n = int(m.group(6))
            ranges.append(RangeSpec(0, n - 1, 1, width=len(m.group(6))))
        elif m.group(4) is not None:  # alpha range
            a, b = ord(m.group(4)), ord(m.group(5))
            if a > b:
                raise ValueError(f"empty alpha range in {template!r}")
            ranges.append(RangeSpec(a, b, 1, width=0, alpha=True))
        else:
            start_tok, end_tok, step_tok = m.group(1), m.group(2), m.group(3)
            start, end = int(start_tok), int(end_tok)
            step = int(step_tok) if step_tok else 1
            if end < start or step <= 0:
                raise ValueError(f"invalid range in {template!r}")
            ranges.append(RangeSpec(start, end, step, width=len(start_tok)))
    literals.append(template[pos:])
    return literals, ranges


def template_count(template: str) -> int:
    """Number of names the template expands to (without expanding)."""
    _, ranges = parse_template(template)
    n = 1
    for r in ranges:
        n *= r.count
    return n


def expand_template(spark: SparkSession, template: str) -> DataFrame:
    """Expand *template* into a one-column DataFrame ``name``.

    Generated entirely on executors via ``spark.range``; successive
    ranges cross-join (sizes multiply, matching the template's
    cartesian semantics).
    """
    literals, ranges = parse_template(template)
    df = spark.range(1).select(F.lit(literals[0]).alias("name"))
    for i, r in enumerate(ranges):
        seg = spark.range(r.start, r.end + 1, r.step)
        if r.alpha:
            segcol = F.expr("char(id)")
        elif r.width:
            segcol = F.lpad(F.col("id").cast("string"), r.width, "0")
        else:
            segcol = F.col("id").cast("string")
        seg = seg.select(segcol.alias("_seg"))
        df = df.crossJoin(seg).select(
            F.concat(F.col("name"), F.col("_seg"), F.lit(literals[i + 1])).alias(
                "name"
            )
        )
    return df
