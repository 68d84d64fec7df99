"""Whole-document (pretty-printed) JSON with payload extraction —
the reference's "flattened_dataframe" path (json_data.py:70-240):
a JSON DOCUMENT (one object spanning many lines, e.g. an API response)
holds its tabular data under a payload key (default candidates
``["data", "payload"]``); that list becomes the DATA rows and
everything else becomes one row of METADATA.

Spark-first: one ``multiLine`` JSON scan (whole-file per-file decode —
these documents are single files by nature; a corpus of them
parallelizes per-file), payload discovery on the SCHEMA plus a single
bounded size-probe row, then explode + struct-flatten — all
expression-level, no Python row loops.

Divergence from the reference (documented): when a payload value is a
dict of record lists (complex_nested.json's zoo), the reference
coalesces ALL nested lists into one frame with union columns; here each
nested array explodes and unions by name (allowMissingColumns), which
produces the same rows for disjoint record shapes and a superset of
columns otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

PAYLOAD_KEYS_DEFAULT = ["data", "payload"]


def _array_fields(schema: StructType, prefix: str = "") -> list[tuple[str, ArrayType]]:
    """Dotted paths of every ArrayType field reachable through structs
    (never descending INTO arrays — their elements are candidate rows,
    not containers of further payloads)."""
    out: list[tuple[str, ArrayType]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, ArrayType):
            out.append((path, f.dataType))
        elif isinstance(f.dataType, StructType):
            out += _array_fields(f.dataType, prefix=f"{path}.")
    return out


def _payload_row_count_expr(df: DataFrame, key: str):
    """Record-count expression for one payload candidate: size of the
    array, or the summed sizes of every array nested under a struct."""
    dtype = df.schema[key].dataType
    if isinstance(dtype, ArrayType):
        return F.coalesce(F.size(F.col(f"`{key}`")), F.lit(0))
    if isinstance(dtype, StructType):
        arrs = _array_fields(dtype, prefix=f"{key}.")
        if not arrs:
            return F.lit(0)
        total = F.lit(0)
        for path, _ in arrs:
            total = total + F.coalesce(F.size(F.col(path)), F.lit(0))
        return total
    return F.lit(0)


def _explode_array(df: DataFrame, path: str, out_prefix: str) -> DataFrame:
    """One payload array -> rows: struct elements flatten to dotted
    columns, array elements (list-of-lists data like math.json) become
    positional columns ``prefix.0..prefix.N``, scalars one column."""
    from dataprofiler_spark.sources.sniff import flatten_struct_columns

    elem = df.select(F.explode(F.col(path)).alias("__e"))
    et = elem.schema["__e"].dataType
    if isinstance(et, StructType):
        flat = flatten_struct_columns(elem.select("__e.*"))
        return flat.toDF(*[f"{out_prefix}.{c}" for c in flat.columns])
    if isinstance(et, ArrayType):
        n = elem.agg(F.max(F.size("__e"))).collect()[0][0] or 0
        cols = [F.element_at("__e", i + 1).alias(f"{out_prefix}.{i}")
                for i in range(n)]
        return elem.select(*cols)
    return elem.select(F.col("__e").alias(out_prefix))


def read_json_document(spark, path: str, payload_keys: list[str] | None = None,
                       encoding: str | None = None
                       ) -> tuple[DataFrame, DataFrame | None]:
    """(data, metadata) for a whole-document JSON file.

    data = the largest payload's records (reference: max row count over
    payload_keys present at top level); metadata = the remaining
    document fields flattened to one row per document — or ``None``
    when no payload key exists (the whole flattened document IS the
    data, e.g. iris-utf-*.json read as one top-level array)."""
    from dataprofiler_spark.sources.sniff import flatten_struct_columns

    reader = spark.read.option("multiLine", True)
    if encoding:
        reader = reader.option("encoding", encoding)
    df = reader.json(path)
    keys = payload_keys if payload_keys is not None else PAYLOAD_KEYS_DEFAULT
    if not isinstance(keys, list):
        keys = [keys]
    present = [k for k in keys if k in df.columns]
    if not present:
        return flatten_struct_columns(df), None
    # one bounded probe row: record counts per candidate
    counts = df.agg(*[F.sum(_payload_row_count_expr(df, k)).alias(k)
                      for k in present]).collect()[0]
    best = max(present, key=lambda k: counts[k] or 0)
    if not counts[best]:
        return flatten_struct_columns(df), None
    dtype = df.schema[best].dataType
    if isinstance(dtype, ArrayType):
        data = _explode_array(df, f"`{best}`", best)
    else:  # struct-of-lists payload: union every nested array's rows
        parts = [_explode_array(df, p, p)
                 for p, _ in _array_fields(dtype, prefix=f"{best}.")]
        data = parts[0]
        for p in parts[1:]:
            data = data.unionByName(p, allowMissingColumns=True)
    meta = flatten_struct_columns(df.drop(best))
    return data, meta
