"""ETL offload — per-object map transforms (T1-T7).

The reference runs user transformers as K8s pods and pipes object bytes
through them, inline on GET (``ais/target.go:976-980``) or offline
bucket-to-bucket (``xact/xs/tcb.go``). The Python transform contract is
``ETLServer.transform(data: bytes, path: str, etl_args: str) -> bytes``
(``python/aistore/sdk/etl/webserver/base_etl_server.py:196-235``), with
an iterator variant ``transform_stream`` for large objects.

Spark-first: a transform is an Arrow-batched Pandas UDF; a pipeline
(``TCBMsg.Transform.Pipeline``, api/apc/tcbtco.go:53-54) is function
composition *inside one UDF* (one Python hop per batch, not one per
stage); ``transform_stream`` maps to ``mapInPandas`` (iterator form).
The K8s pod lifecycle (boot/readiness/abort) is infrastructure Spark
already owns — executors play the pods.

Scale notes: Arrow batches amortize the Python crossing; the transform
stage is embarrassingly parallel and fuses with the write that follows
(no shuffle). Keep everything else (filter/rename) JVM-side.
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the reference's transform contract: (data, path, etl_args) -> bytes
TransformFn = Callable[[bytes, str, str], bytes]


# ---- canned transforms (T6; parity with etl_templates.py:3-380) -------------


def t_echo(data: bytes, path: str, args: str) -> bytes:
    return data


def t_hello_world(data: bytes, path: str, args: str) -> bytes:
    return b"Hello World!"


def t_md5(data: bytes, path: str, args: str) -> bytes:
    return hashlib.md5(data).hexdigest().encode("ascii")


def t_sha256(data: bytes, path: str, args: str) -> bytes:
    return hashlib.sha256(data).hexdigest().encode("ascii")


def t_compress(data: bytes, path: str, args: str) -> bytes:
    # deterministic gzip: fixed level, zeroed mtime
    return gzip.compress(data, compresslevel=6, mtime=0)


def t_decompress(data: bytes, path: str, args: str) -> bytes:
    return gzip.decompress(data)


def t_prepend(data: bytes, path: str, args: str) -> bytes:
    """Prepend etl_args (demonstrates per-request args plumbing)."""
    return args.encode("utf-8") + data


def t_path_info(data: bytes, path: str, args: str) -> bytes:
    """path|args|len — exercises the full 3-arg contract."""
    return f"{path}|{args}|{len(data)}".encode("utf-8")


CANNED: dict[str, TransformFn] = {
    "echo": t_echo,
    "hello_world": t_hello_world,
    "md5": t_md5,
    "sha256": t_sha256,
    "compress": t_compress,
    "decompress": t_decompress,
    "prepend": t_prepend,
    "path_info": t_path_info,
}


def compose(transforms: Sequence[TransformFn]) -> TransformFn:
    """T4: ETL pipeline — ordered chain applied per object
    (``Pipeline []string``, api/apc/tcbtco.go:53-54). Composed into ONE
    Python function so an N-stage pipeline still crosses the
    JVM/Python boundary once per batch."""

    def chained(data: bytes, path: str, args: str) -> bytes:
        for t in transforms:
            data = t(data, path, args)
        return data

    return chained


def resolve(pipeline: Sequence[str | TransformFn]) -> TransformFn:
    fns = [CANNED[t] if isinstance(t, str) else t for t in pipeline]
    return compose(fns)


# ---- UDF plumbing -----------------------------------------------------------


def transform_udf(
    pipeline: Sequence[str | TransformFn], etl_args: str = ""
) -> Callable[[Column, Column], Column]:
    """Build an Arrow-batched Pandas UDF for a transform pipeline.

    Returns a callable of (data_col, path_col) -> bytes column —
    the inline-ETL GET shape (T1)."""
    fn = resolve(pipeline)

    @F.pandas_udf("binary")
    def udf(data: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(d, p, etl_args) for d, p in zip(data, path)], dtype=object
        )

    return udf


def etl_inline(
    df: DataFrame,
    pipeline: Sequence[str | TransformFn],
    data_col: str = "data",
    path_col: str = "name",
    etl_args: str = "",
    out_col: str = "out",
) -> DataFrame:
    """T1: inline ETL — GET piped through the transformer
    (``ais/target.go:976-980``)."""
    udf = transform_udf(pipeline, etl_args)
    return df.withColumn(out_col, udf(F.col(data_col), F.col(path_col)))


def etl_offline(
    objects_with_data: DataFrame,
    pipeline: Sequence[str | TransformFn],
    prefix: str | None = None,
    prepend: str = "",
    ext_remap: dict[str, str] | None = None,
    data_col: str = "data",
    etl_args: str = "",
) -> DataFrame:
    """T2/T3: offline bucket→bucket transform (``TCBMsg``,
    api/apc/tcbtco.go:50-80): prefix-select, transform bytes, remap
    names (prepend + extension), ready to ``.write`` to the destination.
    """
    df = objects_with_data
    if prefix:
        df = df.filter(F.col("name").startswith(prefix))
    udf = transform_udf(pipeline, etl_args)
    out = df.withColumn("out", udf(F.col(data_col), F.col("name")))
    # destination naming: prepend + trailing-extension remap
    # (apc.TCBMsg.Ext, api/apc/tcbtco.go:97-110) — same rule as
    # movement.copy_plan, applied JVM-side.
    new_name = F.concat(F.lit(prepend), F.col("name"))
    for old, new in (ext_remap or {}).items():
        new_name = F.when(
            F.col("name").endswith(old),
            F.concat(
                F.lit(prepend),
                F.expr(f"substring(name, 1, length(name) - {len(old)})"),
                F.lit(new),
            ),
        ).otherwise(new_name)
    return out.withColumn("new_name", new_name)


def etl_stream(
    df: DataFrame,
    pipeline: Sequence[str | TransformFn],
    schema: str,
    data_col: str = "data",
    path_col: str = "name",
    etl_args: str = "",
) -> DataFrame:
    """T5 ``transform_stream`` → ``mapInPandas`` iterator form: the
    transform sees an iterator of Arrow batches, never the whole object
    set in memory."""
    fn = resolve(pipeline)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["out"] = [
                fn(d, p, etl_args) for d, p in zip(pdf[data_col], pdf[path_col])
            ]
            yield pdf

    return df.mapInPandas(run, schema=schema)
