"""Vectorized Spark parse stage.

``parse_lines(df, plan)`` appends the plan's typed field columns plus
``_matched: boolean`` and ``_error: string`` to a DataFrame, evaluating an
Arrow-batched pandas UDF over only the text column (Catalyst prunes every
other column out of the Python exchange).

Per Arrow batch:
  1. **fast path** — rows with no backslash (the overwhelming majority of
     real log lines): one ``Series.str.extract`` with the plan's anchored
     atomic-group regex (provably equivalent to the reference scanner on
     such rows — see plan.py), then vectorized Go-semantics casts.
  2. **slow path** — rows containing a backslash, plus fast-path rows that
     failed (to recover the reference's exact error message): the
     pure-Python oracle interpreter, bit-for-bit ground truth.

Whole-row reject (SURVEY.md §2.3.7): any cast/unescape failure nulls every
field and sets ``_matched=false`` with the reference-format ``_error``.

At 100 TB scale this stage is embarrassingly parallel: no shuffle, no
driver involvement, plan broadcast via the UDF closure, and the only data
crossing JVM→Python is the pruned text column as Arrow buffers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ngxspark.escapes import ESC_NONE
from ngxspark.oracle import DecodeError, _decode, go_quote, zero_value
from ngxspark.plan import MATCH_GROUP, FieldSpec, ParsePlan

# ngx type → Spark SQL type. Unsigned widths widen to the next signed type;
# uint64 maps to long (values above int64.max are rejected as out of range —
# documented deviation, full range lives only in the oracle).
_SPARK_TYPES = {
    "string": T.StringType(),
    "bytes": T.StringType(),
    "bool": T.BooleanType(),
    "byte": T.ShortType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int": T.LongType(),
    "int64": T.LongType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint": T.LongType(),
    "uint64": T.LongType(),
}

_INT_RANGES = {
    "int8": (-(1 << 7), (1 << 7) - 1, "ParseInt"),
    "int16": (-(1 << 15), (1 << 15) - 1, "ParseInt"),
    "int32": (-(1 << 31), (1 << 31) - 1, "ParseInt"),
    "int": (-(1 << 63), (1 << 63) - 1, "ParseInt"),
    "int64": (-(1 << 63), (1 << 63) - 1, "ParseInt"),
    "uint16": (0, (1 << 16) - 1, "ParseUint"),
    "uint32": (0, (1 << 32) - 1, "ParseUint"),
    "uint": (0, (1 << 64) - 1, "ParseUint"),
    "uint64": (0, (1 << 64) - 1, "ParseUint"),
}

MATCHED_COL = "_matched"
ERROR_COL = "_error"


def output_schema(plan: ParsePlan) -> T.StructType:
    fields = [T.StructField(f.name, _SPARK_TYPES[f.typ], True) for f in plan.fields]
    fields.append(T.StructField(MATCHED_COL, T.BooleanType(), False))
    fields.append(T.StructField(ERROR_COL, T.StringType(), True))
    return T.StructType(fields)


def _cast_int_fast(
    vals: pd.Series, spec: FieldSpec, matched: pd.Series, errors: pd.Series
) -> pd.Series:
    """Vectorized strconv.ParseInt/ParseUint over already-extracted strings.

    Returns an object Series of Python ints (None where failed); updates
    ``matched``/``errors`` in place for failing rows.
    """
    lo, hi, fn = _INT_RANGES[spec.typ]
    idx = vals.index
    signed = fn == "ParseInt"
    body = vals.str.replace(r"^[+-]", "", regex=True) if signed else vals
    ok_syntax = body.str.fullmatch(r"[0-9]+").eq(True)

    out = pd.Series([None] * len(vals), index=idx, dtype="object")
    # ≤15 digits → exact through float64; longer (rare) → exact Python int
    short = ok_syntax & (body.str.len() <= 15)
    long_ = ok_syntax & ~short
    if short.any():
        out.loc[short] = pd.to_numeric(vals[short]).astype("int64").astype(object)
    if long_.any():
        out.loc[long_] = vals[long_].map(int)

    in_range = ok_syntax.copy()
    if ok_syntax.any():
        bad_range = out[ok_syntax].map(lambda v: v < lo or v > hi)
        in_range.loc[ok_syntax] = ~bad_range.to_numpy(dtype=bool)
        out.loc[~in_range] = None

    bad = ~(ok_syntax & in_range)
    if bad.any():
        bad_idx = idx[bad]
        reason = pd.Series(
            np.where(ok_syntax[bad], "value out of range", "invalid syntax"),
            index=bad_idx,
        )
        quoted = vals[bad].map(go_quote)
        if spec.typ == "int8":  # codec.go:87-97 wraps the strconv error
            msg = "field " + go_quote(spec.var) + " expected int8, got " + quoted
        else:
            msg = (
                "field " + go_quote(spec.var)
                + f" strconv.{fn}: parsing "
                + quoted + ": " + reason
            )
        matched.loc[bad_idx] = False
        need = errors.loc[bad_idx].isna()
        errors.loc[bad_idx[need]] = msg[need]
    return out


def _cast_fast(
    vals: pd.Series, spec: FieldSpec, matched: pd.Series, errors: pd.Series
) -> pd.Series:
    if spec.typ in ("string", "bytes"):
        return vals
    if spec.typ == "bool":
        return vals.str.lower() == "true"
    if spec.typ == "byte":
        blen = vals.map(lambda s: len(s.encode("utf-8")) if isinstance(s, str) else -1)
        ok = blen == 1
        out = pd.Series([None] * len(vals), index=vals.index, dtype="object")
        if ok.any():
            out.loc[ok] = vals[ok].map(ord)
        if (~ok).any():
            bad_idx = vals.index[~ok]
            msg = "field " + go_quote(spec.var) + " expected byte, got " + vals[~ok].map(go_quote)
            matched.loc[bad_idx] = False
            need = errors.loc[bad_idx].isna()
            errors.loc[bad_idx[need]] = msg[need]
        return out
    return _cast_int_fast(vals, spec, matched, errors)


def _py_value(spec: FieldSpec, v):
    """Oracle value → Spark-facing value (bytes → str)."""
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _oracle_row(plan: ParsePlan, line: str) -> tuple[dict, bool, str | None]:
    try:
        got = _decode(plan.ops, plan.fmt.esc, line.encode("utf-8", "surrogateescape"))
    except DecodeError as e:
        return {}, False, str(e)
    return got, True, None


def make_parse_fn(plan: ParsePlan):
    """Build the per-batch pandas function (exposed for differential tests)."""
    field_specs = plan.fields
    esc = plan.fmt.esc
    pattern = plan.pattern
    always_error = plan.always_error
    supported = plan.fmt.supported
    cast_order = sorted(
        (f for f in field_specs if f.group is not None),
        key=lambda f: supported.get(f.name, 1 << 30),
    )

    def parse_batch(s: pd.Series) -> pd.DataFrame:
        import re as _re

        n = len(s)
        idx = s.index
        out = {f.name: pd.Series([None] * n, index=idx, dtype="object") for f in field_specs}
        matched = pd.Series(False, index=idx)
        errors = pd.Series([None] * n, index=idx, dtype="object")

        notnull = s.notna()
        errors[~notnull] = "null text"

        if always_error is not None:
            errors[notnull] = always_error
        else:
            if esc == ESC_NONE:
                fast = notnull
            else:
                fast = notnull & ~s.str.contains("\\", regex=False).eq(True)
            slow = notnull & ~fast

            if fast.any():
                rx = _re.compile(pattern)
                ext = s[fast].str.extract(rx)
                hit = ext[MATCH_GROUP].notna()
                hit_idx = ext.index[hit]
                matched[hit_idx] = True
                # Go zero values for fields with no regex group (unbound
                # vars / vars not in the format) on successful rows:
                for f in field_specs:
                    if f.group is None:
                        if f.typ in ("string", "bytes"):
                            out[f.name].loc[hit_idx] = ""
                        elif f.typ == "bool":
                            out[f.name].loc[hit_idx] = False
                        else:
                            out[f.name].loc[hit_idx] = 0
                # Casts run in op order so the FIRST failing field (as the
                # reference's left-to-right scan sees it) sets _error:
                for f in cast_order:
                    vals = ext.loc[hit_idx, f.group]
                    out[f.name].loc[hit_idx] = _cast_fast(vals, f, matched, errors)
                # regex misses → oracle for the exact reference error
                miss_idx = ext.index[~hit]
                if len(miss_idx):
                    slow = slow.copy()
                    slow[miss_idx] = True

            slow_idx = idx[slow]
            for i in slow_idx:
                got, ok, err = _oracle_row(plan, s[i])
                matched[i] = ok
                errors[i] = err
                if ok:
                    for f in field_specs:
                        if plan.mode == "map":
                            v = got.get(f.name)
                        else:
                            v = got.get(f.name)
                            if v is None:
                                v = zero_value(f.typ)
                        out[f.name][i] = _py_value(f, v)

        res = pd.DataFrame(index=idx)
        for f in field_specs:
            col = out[f.name]
            col[~matched] = None  # whole-row reject nulls every field
            res[f.name] = col
        res[MATCHED_COL] = matched
        res[ERROR_COL] = errors
        return res

    return parse_batch


def make_parse_udf(plan: ParsePlan):
    """Build the Arrow-batched pandas UDF for a compiled plan."""
    return pandas_udf(make_parse_fn(plan), returnType=output_schema(plan))


def parse_lines(
    df: DataFrame,
    plan: ParsePlan,
    text_col: str | Column = "text",
    struct_col: str = "parsed",
    flatten: bool = True,
) -> DataFrame:
    """Append parsed fields (+ _matched/_error) to ``df``.

    With ``flatten=True`` the fields land as top-level columns; otherwise a
    single struct column ``struct_col`` is added.
    """
    udf = make_parse_udf(plan)
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    out = df.withColumn(struct_col, udf(col))
    if flatten:
        out = out.select("*", f"{struct_col}.*").drop(struct_col)
    return out
