"""Brace-range template expansion (the reference's F2 predicate).

The reference accepts bash-brace templates naming object sets:
``prefix-{0001..0010..2}-suffix`` (numeric, optional step, zero-padded
to ``min(len(start), len(end))`` per ``parseBashRangeNumbers``,
``cmn/cos/template.go:305-320``), multiple ranges per template,
single-char alpha ranges ``{a..z}``, the at-style shorthand
``prefix-@100`` (Start=0, End=100 *inclusive*, DigitCount=3 → 101
names ``000``..``100``, ``cmn/cos/template.go:408-441``), and
fmt-style ``prefix-%06d-suffix`` (Start=0, End=MaxInt64 — an
*unbounded* range usable only as a matcher,
``cmn/cos/template.go:260-303``). Re-implemented from the documented
surface, not ported. Parse precedence mirrors ``NewParsedTemplate``
(``template.go:122-142``): bash/at ranges win; ``%..d`` is only
recognized when no brace/at range matched.

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
# fmt-style directive: exactly one '%', '%d' or '%0Nd' (template.go:260-291)
_FMT = re.compile(r"%(?:0(\d+))?d")


@dataclass(frozen=True)
class RangeSpec:
    start: int
    end: int  # inclusive; -1 with fmt=True means unbounded (MaxInt64)
    step: int
    width: int  # zero-pad width; 0 = no padding
    alpha: bool = False
    fmt: bool = False  # unbounded %0Nd range — matcher-only

    @property
    def count(self) -> int:
        if self.fmt:
            raise ValueError("fmt-style template range is unbounded")
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
        if m.group(6) is not None:  # @N shorthand — END-INCLUSIVE
            # ParseAtTemplate (template.go:408-441): Start=0, End=N,
            # DigitCount=len(number) — '@100' yields 101 names 000..100.
            n = int(m.group(6))
            ranges.append(RangeSpec(0, n, 1, width=len(m.group(6))))
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
            # parseBashRangeNumbers (template.go:305-320):
            # DigitCount = min(len(start), len(end))
            width = min(len(start_tok), len(end_tok))
            ranges.append(RangeSpec(start, end, step, width=width))
    literals.append(template[pos:])
    if not ranges:
        # NewParsedTemplate precedence (template.go:122-142): bash and
        # at-style parse first; only then is a single '%..d' directive
        # recognized as an fmt template (unbounded 0..MaxInt64 range).
        fm = list(_FMT.finditer(template))
        if len(fm) == 1 and template.count("%") == 1:
            m = fm[0]
            width = int(m.group(1)) if m.group(1) else 0
            return (
                [template[: m.start()], template[m.end() :]],
                [RangeSpec(0, -1, 1, width=width, fmt=True)],
            )
        if "%" in template and "d" in template.split("%", 1)[1]:
            raise ValueError(
                f"unsupported fmt-style template {template!r}: multiple '%' "
                "directives (reference accepts exactly one, template.go:265)"
            )
    return literals, ranges


def has_fmt_range(template: str) -> bool:
    """True if *template* parses as an unbounded fmt-style template."""
    _, ranges = parse_template(template)
    return any(r.fmt for r in ranges)


def template_regex(template: str) -> str:
    """Anchored regex matching every name the template can generate.

    Needed for fmt-style templates whose range is unbounded
    (``template.go:260-303``): a zero-padded ``%0Nd`` renders exactly N
    digits for values < 10^N and more above, so the match is
    ``\\d{N,}``. Literal pieces are escaped.
    """
    literals, ranges = parse_template(template)
    parts = [re.escape(literals[0])]
    for i, r in enumerate(ranges):
        if r.fmt:
            parts.append(r"\d{%d,}" % max(r.width, 1))
        elif r.alpha:
            parts.append("[%s-%s]" % (chr(r.start), chr(r.end)))
        else:
            parts.append(r"\d+")
        parts.append(re.escape(literals[i + 1]))
    return "^" + "".join(parts) + "$"


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
    if any(r.fmt for r in ranges):
        raise ValueError(
            f"fmt-style template {template!r} is unbounded (0..MaxInt64, "
            "template.go:295-301) and cannot be expanded; use "
            "template_regex()/select_by_template() to match instead"
        )
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
