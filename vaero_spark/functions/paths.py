"""Dotted-path column helpers.

The reference addresses event fields with gjson/sjson dotted paths over
schemaless JSON strings (e.g. ``actor.alternateId`` in
``/root/reference/pipelines/okta_pipe.py:11-12``). Our engine has a
static schema, so a dotted path is a nested ``StructType`` field:
get = ``F.col("a.b")``, set = ``withField``, delete = ``dropFields``.
Schema evolution happens at *plan time* (each transform changes the
DataFrame schema deterministically) — strictly stronger than the
reference's per-event dynamism, and what makes Catalyst codegen and
pushdown possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _struct_has(schema: T.StructType, parts: list[str]) -> bool:
    cur: T.DataType = schema
    for p in parts:
        if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
            return False
        cur = cur[p].dataType
    return True


def has_column(df: DataFrame, path: str) -> bool:
    return _struct_has(df.schema, path.split("."))


def col_get(df: DataFrame, path: str) -> Column:
    """Value at path; missing path ⇒ typed null (gjson missing ⇒ Null,
    cf. ``/root/reference/transform/rename.go`` set-of-missing ⇒ null)."""
    if has_column(df, path):
        return F.col(path)
    return F.lit(None)


def col_set(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Set path to value, creating intermediate structs as needed
    (sjson.Set semantics, ``/root/reference/transform/add.go``)."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.withColumn(path, value)
    top = parts[0]
    if has_column(df, top):
        base = F.col(top)
        new = _set_nested(df.schema[top].dataType, base, parts[1:], value)
    else:
        new = _build_struct(parts[1:], value)
    return df.withColumn(top, new)


def _set_nested(dtype: T.DataType, base: Column, parts: list[str], value: Column) -> Column:
    if len(parts) == 1:
        if isinstance(dtype, T.StructType):
            return base.withField(parts[0], value)
        return _build_struct(parts, value)  # overwrite non-struct with new struct
    if isinstance(dtype, T.StructType) and parts[0] in dtype.fieldNames():
        inner = _set_nested(dtype[parts[0]].dataType, base.getField(parts[0]), parts[1:], value)
        return base.withField(parts[0], inner)
    if isinstance(dtype, T.StructType):
        return base.withField(parts[0], _build_struct(parts[1:], value))
    return _build_struct(parts, value)


def _build_struct(parts: list[str], value: Column) -> Column:
    out = value
    for p in reversed(parts):
        out = F.struct(out.alias(p))
    return out


def col_delete(df: DataFrame, path: str) -> DataFrame:
    """Remove key at path; no-op if absent (sjson.Delete semantics,
    ``/root/reference/transform/delete.go``)."""
    if not has_column(df, path):
        return df
    parts = path.split(".")
    if len(parts) == 1:
        return df.drop(path)
    top = parts[0]
    dtype = df.schema[top].dataType
    # dropFields handles arbitrary nesting via dotted name on the struct col
    inner_path = ".".join(f"`{p}`" for p in parts[1:])
    new = F.col(top).dropFields(inner_path)
    # If the struct would become empty, drop the whole column (sjson leaves {}
    # — divergence documented: Spark cannot type an empty struct usefully).
    if isinstance(dtype, T.StructType) and len(parts) == 2 and len(dtype.fieldNames()) == 1:
        return df.drop(top)
    return df.withColumn(top, new)
