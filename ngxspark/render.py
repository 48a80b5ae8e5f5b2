"""Marshal direction as JVM-side Spark expressions.

``render_expr(fmt, bindings, cols)`` rebuilds the log line from typed
columns — literals verbatim, unbound variables as the dialect nil token,
bound fields dialect-escaped (reference: codec_struct.go:52-69,
escape.go:103-132, 181-227). Whole-stage-codegen friendly: only
``concat``/``regexp_replace``/``translate`` chains, no Python.

Used for round-trip fixtures and for Spark-native synthetic corpus
generation at bench scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ngxspark.escapes import ESC_DEFAULT, ESC_JSON
from ngxspark.fmtcompile import OP_BIND, OP_ESC_STRING, OP_STRING, OP_VARIABLE, LogFormat
from ngxspark.oracle import bind_struct

_JSON_NAMED = {0x0A: "n", 0x0D: "r", 0x09: "t", 0x08: "b", 0x0C: "f"}


def escape_expr(
    col: Column, esc: int, strict_quirks: bool = True, controls: bool = False
) -> Column:
    """Dialect escape as a regexp_replace chain (backslash first).

    ``controls=True`` adds the 32 control-char replacements (\\xHH /
    \\u00XX); off by default — the 34-deep chain per column blows the
    whole-stage-codegen method size and log fields virtually never carry
    control bytes. The oracle's escape kernels always handle them.
    """
    if esc == ESC_DEFAULT:
        out = F.regexp_replace(col, r"\\", r"\\\\")
        out = F.regexp_replace(out, '"', '\\\\"')
        if controls:
            for ch in range(0x20):
                out = F.regexp_replace(out, "\\x%02x" % ch, "\\\\x%02X" % ch)
        return out
    if esc == ESC_JSON:
        out = F.regexp_replace(col, r"\\", r"\\\\")
        out = F.regexp_replace(out, '"', '\\\\"')
        for ch in range(0x20):
            if not controls and ch not in _JSON_NAMED:
                continue
            if ch in _JSON_NAMED:
                rep = "\\\\" + _JSON_NAMED[ch]
            elif strict_quirks:  # escape.go:205-214 transposition quirk
                rep = "\\\\00u%02X" % ch
            else:
                rep = "\\\\u%04X" % ch
            out = F.regexp_replace(out, "\\x%02x" % ch, rep)
        return out
    return col


def _encode_col(
    col: Column, typ: str, esc: int, strict_quirks: bool, controls: bool
) -> Column:
    """NULL-aware: a bound-but-NULL value renders as the dialect nil token
    — the ptr-codec analogue (reference codec.go:287-291 emits the nil
    token for a nil pointer)."""
    from ngxspark.escapes import nil_token

    if typ == "bool":
        encoded = F.when(col, F.lit("true")).when(~col, F.lit("false"))
    elif typ in ("string", "bytes"):
        encoded = escape_expr(col.cast("string"), esc, strict_quirks, controls)
    elif typ in ("uint", "uint64"):
        # decimal(20,0) → string directly; a long hop overflows above 2^63-1
        encoded = col.cast("decimal(20,0)").cast("string")
    else:
        encoded = col.cast("long").cast("string")  # signed ints: strconv.FormatInt
    return F.coalesce(encoded, F.lit(nil_token(esc).decode("utf-8")))


def render_expr(
    fmt: LogFormat,
    bindings: dict[str, str],
    cols: dict[str, Column] | None = None,
    strict_quirks: bool = True,
    controls: bool = False,
) -> Column:
    """Struct-mode Marshal. ``cols`` maps variable name → Column (defaults
    to ``F.col(var)``); unbound variables emit the dialect nil token.
    ``controls=True`` adds the 32 control-char escapes (\\xHH/\\u00XX) to
    match the reference kernel exactly for fields carrying bytes <0x20."""
    from ngxspark.escapes import nil_token

    cols = cols or {}
    parts: list[Column] = []
    for op in bind_struct(fmt, bindings):
        if op.type in (OP_STRING, OP_ESC_STRING):
            parts.append(F.lit(op.extra.decode("utf-8")))
        elif op.type == OP_VARIABLE:
            parts.append(F.lit(nil_token(fmt.esc).decode("utf-8")))
        elif op.type == OP_BIND:
            col = cols.get(op.field, F.col(op.field))
            parts.append(_encode_col(col, op.typ, fmt.esc, strict_quirks, controls))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def render_map_expr(
    fmt: LogFormat, cols: dict[str, Column] | None = None, strict_quirks: bool = True,
    controls: bool = False,
) -> Column:
    """Map-mode Marshal (codec_map.go:64-85): literals verbatim, ``_``
    discard variables emit NOTHING (codec_map.go:75-76), every other
    variable renders its (string) column dialect-escaped; a missing/NULL
    value renders as the zero-value element ``""`` (codec_map.go:78-80 —
    map lookups can't be nil, unlike the struct ptr-codec)."""
    from ngxspark.oracle import bind_map

    cols = cols or {}
    parts: list[Column] = []
    for op in bind_map(fmt):
        if op.type in (OP_STRING, OP_ESC_STRING):
            parts.append(F.lit(op.extra.decode("utf-8")))
        elif op.type == OP_VARIABLE:
            pass  # `_` discard: emits nothing in map mode
        elif op.type == OP_BIND:
            col = F.coalesce(cols.get(op.field, F.col(op.field)).cast("string"), F.lit(""))
            parts.append(escape_expr(col, fmt.esc, strict_quirks, controls))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


_CONTROL_GUARD = {
    ESC_DEFAULT: "[\\x00-\\x1f]",
    # json: \n \r \t \b \f are handled by the default expression chain;
    # only the \00uXX-quirk controls need the exact kernel
    ESC_JSON: "[\\x00-\\x07\\x0b\\x0e-\\x1f]",
}


def render_lines(
    df,
    fmt: LogFormat,
    bindings: dict[str, str],
    out_col: str = "line",
    strict_quirks: bool = True,
    mode: str = "struct",
):
    """EXACT Marshal over a DataFrame — hybrid, mirroring parse_lines:

    * JVM expression path (render_expr/render_map_expr, controls=False)
      for rows whose bound string fields carry no control bytes — the
      overwhelming majority; whole-stage codegen, no Python;
    * the exact oracle kernel (encode_struct/encode_map — escape.go
      byte-for-byte, incl. the \\00uXX json quirk) via an Arrow-batched
      pandas UDF for rows that DO carry control bytes. The UDF input is
      NULL-masked for clean rows, so the Python exchange carries ~nothing.

    This closes the round-1 divergence where control bytes in a bound
    field silently rendered unescaped (escape_expr controls=False).
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ngxspark.oracle import encode_map, encode_struct

    if mode == "struct":
        str_fields = [n for n, t in bindings.items() if t in ("string", "bytes") and n != "_"]
        jvm = render_expr(fmt, bindings, strict_quirks=strict_quirks, controls=False)
    else:
        from ngxspark.oracle import bind_map

        str_fields = [op.field for op in bind_map(fmt) if op.type == OP_BIND]
        jvm = render_map_expr(fmt, strict_quirks=strict_quirks, controls=False)

    guard_rx = _CONTROL_GUARD.get(fmt.esc)
    if guard_rx is None or not str_fields:  # escape=none / no string binds: JVM is exact
        return df.withColumn(out_col, jvm)

    needs_exact = F.lit(False)
    for n in str_fields:
        needs_exact = needs_exact | F.col(n).rlike(guard_rx)

    field_names = (
        [n for n in bindings if n != "_"] if mode == "struct" else list(str_fields)
    )

    def _field_typ(name: str) -> str:
        return bindings.get(name, "string") if mode == "struct" else "string"

    def exact_kernel(*cols):
        trigger = cols[0]
        out = []
        for i in range(len(trigger)):
            t = trigger.iloc[i]
            # clean row: masked to NULL (None/NaN; True may be np.bool_)
            if t is None or t != t or not bool(t):
                out.append(None)
                continue
            vals = {}
            for name, series in zip(field_names, cols[1:]):
                v = series.iloc[i]
                typ = _field_typ(name)
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    if mode == "struct":
                        vals[name] = None  # NULL bind → nil token (ptr analogue)
                    # map mode: NULL models a MISSING key → zero-value elem ""
                    # (codec_map.go:78-80); leaving the key out matches the
                    # JVM path's coalesce(col, '') — a present-None key
                    # would crash encode_map (found by map-mode render fuzz)
                elif typ == "bool":
                    vals[name] = v == "true"
                elif typ not in ("string", "bytes"):
                    # numerics arrive as exact JVM-rendered strings (see
                    # kernel input below) — int() them back losslessly
                    vals[name] = int(v)
                elif isinstance(v, str):
                    vals[name] = v.encode("utf-8", "surrogateescape")
                else:
                    vals[name] = v
            if mode == "struct":
                b = encode_struct(fmt, bindings, vals, strict_quirks=strict_quirks)
            else:
                b = encode_map(fmt, vals, strict_quirks=strict_quirks)
            out.append(b.decode("utf-8", "surrogateescape"))
        return pd.Series(out, dtype="object")

    # the trigger doubles as the NULL-mask: the kernel sees work only for
    # control-carrying rows. asNondeterministic stops Catalyst duplicating
    # the UDF below exchanges (same guard as the parse UDF).
    # Numeric/bool fields cross the Arrow boundary as exact JVM-rendered
    # strings: a nullable long column would otherwise land in pandas as
    # float64, silently rounding values above 2^53 (found by render fuzz:
    # 2^63-1 rendered as ...808).
    def kernel_input(n: str) -> Column:
        return F.col(n) if _field_typ(n) in ("string", "bytes") else F.col(n).cast("string")

    kernel = pandas_udf(exact_kernel, T.StringType()).asNondeterministic()
    kernel_out = kernel(F.when(needs_exact, F.lit(True)), *[kernel_input(n) for n in field_names])
    return df.withColumn(out_col, F.when(needs_exact, kernel_out).otherwise(jvm))
