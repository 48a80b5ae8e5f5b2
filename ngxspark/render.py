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
    if typ == "bool":
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if typ in ("string", "bytes"):
        return escape_expr(col.cast("string"), esc, strict_quirks, controls)
    if typ in ("uint", "uint64"):
        # decimal(20,0) → string directly; a long hop overflows above 2^63-1
        return col.cast("decimal(20,0)").cast("string")
    return col.cast("long").cast("string")  # signed ints: strconv.FormatInt


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
