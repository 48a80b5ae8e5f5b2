"""Single-line reference interpreter — the ground truth for the vectorized stage.

Faithful transliteration of the reference's decode/encode interpreters
(/root/reference/codec_struct.go:52-181, codec_map.go:64-199) and scalar
codecs (/root/reference/codec.go), over ``bytes``. Every behavior the
vectorized Spark path claims is differential-tested against this module.

Key semantics (SURVEY.md §2.3):
  * anchored at start; literal op = exact prefix else error;
  * variable value ends at the FIRST occurrence of the next literal;
  * ESC_STRING delimiters get the backslash-retry rule (dialect default:
    always skip; json: accept iff the candidate window json-unescapes
    cleanly — note the discard path validates only the CURRENT window
    while the bind path unescapes from the stable start offset);
  * bound raw segments are dialect-unescaped before the typed codec runs;
  * any codec/unescape error rejects the whole line;
  * a trailing unbound variable ends decode successfully; a trailing bound
    variable consumes the rest of the line; trailing ops after a final
    literal are unreachable and any input after it is ignored.
"""

from __future__ import annotations

from dataclasses import dataclass

from ngxspark.escapes import (
    ESC_JSON,
    EscapeError,
    escape,
    nil_token,
    unescape,
)
from ngxspark.fmtcompile import (
    OP_BIND,
    OP_ESC_STRING,
    OP_STRING,
    OP_VARIABLE,
    LogFormat,
    Op,
)


class DecodeError(ValueError):
    """Whole-line parse reject; message mirrors the reference error text."""


class EncodeError(ValueError):
    pass


def go_quote(b: bytes | str) -> str:
    """Approximation of Go's %q for error-message construction.

    Exact for ASCII-printable content (all that appears in real log
    templates); non-printable bytes render as \\xHH like Go.
    """
    if isinstance(b, str):
        b = b.encode("utf-8", "surrogateescape")
    out = ['"']
    for ch in b:
        c = chr(ch)
        if c == '"':
            out.append('\\"')
        elif c == "\\":
            out.append("\\\\")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c == "\t":
            out.append("\\t")
        elif 0x20 <= ch < 0x7F:
            out.append(c)
        else:
            out.append("\\x%02x" % ch)
    out.append('"')
    return "".join(out)


# ---------------------------------------------------------------------------
# Scalar codecs (reference: codec.go). Registry keyed by type name.
# ---------------------------------------------------------------------------

_INT_BITS = {"int": 64, "int8": 8, "int16": 16, "int32": 32, "int64": 64}
_UINT_BITS = {"uint": 64, "uint16": 16, "uint32": 32, "uint64": 64}

SUPPORTED_TYPES = (
    "string",
    "bytes",
    "bool",
    "byte",
    *_INT_BITS.keys(),
    *_UINT_BITS.keys(),
)


def go_parse_int(s: str, bits: int) -> int:
    """strconv.ParseInt(s, 10, bits): optional sign, ASCII digits only."""
    body = s
    if body[:1] in ("+", "-"):
        body = body[1:]
    if body == "" or not all("0" <= c <= "9" for c in body):
        raise DecodeError(f"strconv.ParseInt: parsing {go_quote(s)}: invalid syntax")
    v = int(s)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if v < lo or v > hi:
        raise DecodeError(f"strconv.ParseInt: parsing {go_quote(s)}: value out of range")
    return v


def go_parse_uint(s: str, bits: int) -> int:
    """strconv.ParseUint(s, 10, bits): no sign allowed, ASCII digits only."""
    if s == "" or not all("0" <= c <= "9" for c in s):
        raise DecodeError(f"strconv.ParseUint: parsing {go_quote(s)}: invalid syntax")
    v = int(s)
    if v > (1 << bits) - 1:
        raise DecodeError(f"strconv.ParseUint: parsing {go_quote(s)}: value out of range")
    return v


def decode_typed(typ: str, raw: bytes):
    """Raw (already-unescaped) segment → typed Python value. Raises DecodeError."""
    if typ in ("string", "bytes"):
        return raw
    if typ == "bool":  # codec.go:273-280 — never errors
        return raw.decode("utf-8", "surrogateescape").lower() == "true"
    s = raw.decode("utf-8", "surrogateescape")
    if typ == "byte":  # codec.go:70-76 — exactly one byte, stored raw
        if len(raw) != 1:
            raise DecodeError(f"expected byte, got {go_quote(raw)}")
        return raw[0]
    if typ == "int8":  # codec.go:87-97 — wraps the strconv error
        try:
            return go_parse_int(s, 8)
        except DecodeError:
            raise DecodeError(f"expected int8, got {go_quote(raw)}") from None
    if typ in _INT_BITS:
        return go_parse_int(s, _INT_BITS[typ])
    if typ in _UINT_BITS:
        return go_parse_uint(s, _UINT_BITS[typ])
    raise EncodeError(f'Unsupported decoding type "{typ}"')


def encode_typed(typ: str, value, esc: int, strict_quirks: bool = True) -> bytes:
    """Typed value → raw bytes with dialect escaping for string/bytes (codec.go:319-355)."""
    if typ in ("string", "bytes"):
        if isinstance(value, str):
            value = value.encode("utf-8", "surrogateescape")
        return escape(esc, value, strict_quirks=strict_quirks)
    if typ == "bool":
        return b"true" if value else b"false"
    return str(int(value)).encode("ascii")


def zero_value(typ: str):
    if typ in ("string", "bytes"):
        return b""
    if typ == "bool":
        return False
    if typ not in SUPPORTED_TYPES:
        # unsupported-typed field absent from the format: Go leaves the
        # struct field at its (unrepresentable here) zero value → NULL
        return None
    return 0


# ---------------------------------------------------------------------------
# Op binding: struct mode rewrites the op at supported[name] to a BIND
# (codec_struct.go:17-45); map mode binds every non-`_` variable
# (codec_map.go:16-51).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BoundOp:
    type: int
    extra: bytes
    field: str | None = None  # output field name (struct) / map key (map)
    typ: str = "string"


def bind_struct(fmt: LogFormat, bindings: dict[str, str]) -> tuple[BoundOp, ...]:
    """bindings: var name → type name. Vars absent from bindings stay discards;
    duplicate var names bind only the LAST occurrence (supported keeps last index).

    Type validation happens only for fields actually present in the format
    (codec_struct.go:34-42 builds codecs only for ngx.supported hits) — a
    field with an unsupported type that is absent from the format succeeds
    and stays at its zero value, exactly like the Go reference."""
    ops = [BoundOp(op.type, op.extra) for op in fmt.ops]
    for name, typ in bindings.items():
        if name == "_":
            continue
        ind = fmt.supported.get(name)
        if ind is None:
            continue
        if typ not in SUPPORTED_TYPES:
            raise EncodeError(f'Unsupported decoding type "{typ}"')
        ops[ind] = BoundOp(OP_BIND, fmt.ops[ind].extra, field=name, typ=typ)
    return tuple(ops)


def bind_map(fmt: LogFormat) -> tuple[BoundOp, ...]:
    """Every variable except `_` becomes a string bind; duplicates all bind
    (last decoded occurrence wins in the output dict)."""
    out = []
    for op in fmt.ops:
        if op.type == OP_VARIABLE and op.extra != b"_":
            out.append(BoundOp(OP_BIND, op.extra, field=op.extra.decode("utf-8"), typ="string"))
        else:
            out.append(BoundOp(op.type, op.extra))
    return tuple(out)


# ---------------------------------------------------------------------------
# Decode interpreter (codec_struct.go:71-181 / codec_map.go:87-199 — the two
# differ only in what BIND does with the decoded value).
# ---------------------------------------------------------------------------


def _decode(ops: tuple[BoundOp, ...], esc: int, data: bytes) -> dict:
    out: dict = {}
    p = 0
    length = len(ops)
    i = 0
    while i < length:
        op = ops[i]
        if op.type in (OP_STRING, OP_ESC_STRING):
            if not data[p:].startswith(op.extra):
                got = data[p : p + len(op.extra)]
                raise DecodeError(
                    f"got unexpected string {go_quote(got)}, expecting {go_quote(op.extra)}"
                )
            p += len(op.extra)
        elif op.type == OP_VARIABLE:
            if i + 1 >= length:
                return out  # trailing unbound var: immediate success
            nxt = ops[i + 1]
            if nxt.type == OP_STRING:
                off = data.find(nxt.extra, p)
                if off < 0:
                    raise DecodeError(
                        f"got unexpected EOF: expecting {go_quote(nxt.extra)} after ${op.extra.decode('utf-8')}"
                    )
                i += 1
                p = off + len(nxt.extra)
            elif nxt.type == OP_ESC_STRING:
                while True:
                    off = data.find(nxt.extra, p)
                    if off < 0:
                        raise DecodeError(
                            f"got unexpected EOF: expecting {go_quote(nxt.extra)} after ${op.extra.decode('utf-8')}"
                        )
                    if off > p and data[off - 1] == 0x5C:
                        if esc == ESC_JSON:
                            # discard path validates only the CURRENT window
                            try:
                                unescape(esc, data[p:off])
                            except EscapeError:
                                p = off + len(nxt.extra)
                                continue
                        else:
                            p = off + len(nxt.extra)
                            continue
                    break
                i += 1
                p = off + len(nxt.extra)
            else:
                raise DecodeError(
                    f"ngx-go does not support '${op.extra.decode('utf-8')}${nxt.extra.decode('utf-8')}' style format"
                )
        elif op.type == OP_BIND:
            raw: bytes
            unescaped_already = False
            if i + 1 >= length:
                raw = data[p:]
                p = len(data)
            else:
                nxt = ops[i + 1]
                if nxt.type == OP_STRING:
                    off = data.find(nxt.extra, p)
                    if off < 0:
                        raise DecodeError(
                            f"got unexpected EOF: expecting {go_quote(nxt.extra)} after ${op.extra.decode('utf-8')}"
                        )
                    raw = data[p:off]
                    i += 1
                    p = off + len(nxt.extra)
                elif nxt.type == OP_ESC_STRING:
                    oldp = p
                    while True:
                        off = data.find(nxt.extra, p)
                        if off < 0:
                            raise DecodeError(
                                f"got unexpected EOF: expecting {go_quote(nxt.extra)} after ${op.extra.decode('utf-8')}"
                            )
                        if off > p and data[off - 1] == 0x5C:
                            if esc == ESC_JSON:
                                # bind path: try unescaping the stable window
                                try:
                                    raw = unescape(esc, data[oldp:off])
                                    unescaped_already = True
                                    i += 1
                                    p = off + len(nxt.extra)
                                    break
                                except EscapeError:
                                    pass
                            p = off + len(nxt.extra)
                            continue
                        raw = data[oldp:off]
                        i += 1
                        p = off + len(nxt.extra)
                        break
                else:
                    raise DecodeError(
                        f"ngx-go does not support '${op.extra.decode('utf-8')}${nxt.extra.decode('utf-8')}' style format"
                    )
            if not unescaped_already:
                try:
                    raw = unescape(esc, raw)
                except EscapeError as e:
                    raise DecodeError(str(e)) from None
            try:
                val = decode_typed(op.typ, raw)
            except DecodeError as e:
                # struct mode wraps field errors (codec_struct.go:171-173);
                # map mode does not (codec_map.go:187-189) — but map values
                # are always strings, which never error, so wrapping is safe.
                raise DecodeError(f"field {go_quote(op.extra)} {e}") from None
            out[op.field] = val
        else:
            raise DecodeError(f"Unsupported operator type({op.type})")
        i += 1
    return out


def decode_struct(fmt: LogFormat, bindings: dict[str, str], data: bytes) -> dict:
    """Line → typed record. Unbound/unseen fields get Go zero values."""
    ops = bind_struct(fmt, bindings)
    got = _decode(ops, fmt.esc, data)
    return {name: got.get(name, zero_value(typ)) for name, typ in bindings.items() if name != "_"}


def decode_map(fmt: LogFormat, data: bytes) -> dict[str, bytes]:
    """Line → {var: raw string bytes}; `_` vars discarded; last duplicate wins."""
    return _decode(bind_map(fmt), fmt.esc, data)


# ---------------------------------------------------------------------------
# Encode interpreter (codec_struct.go:52-69 / codec_map.go:64-85).
# ---------------------------------------------------------------------------


def encode_struct(
    fmt: LogFormat, bindings: dict[str, str], values: dict, strict_quirks: bool = True
) -> bytes:
    ops = bind_struct(fmt, bindings)
    out = bytearray()
    for op in ops:
        if op.type in (OP_STRING, OP_ESC_STRING):
            out += op.extra
        elif op.type == OP_VARIABLE:
            out += nil_token(fmt.esc)  # unbound var → dialect nil (codec_struct.go:59-60)
        elif op.type == OP_BIND:
            val = values.get(op.field, zero_value(op.typ))
            if val is None:
                # ptr-codec analogue: a bound-but-nil value encodes as the
                # dialect nil token (codec.go:287-291)
                out += nil_token(fmt.esc)
            else:
                out += encode_typed(op.typ, val, fmt.esc, strict_quirks=strict_quirks)
    return bytes(out)


def encode_map(fmt: LogFormat, mapping: dict, strict_quirks: bool = True) -> bytes:
    ops = bind_map(fmt)
    out = bytearray()
    for op in ops:
        if op.type in (OP_STRING, OP_ESC_STRING):
            out += op.extra
        elif op.type == OP_VARIABLE:
            pass  # `_` discard var emits nothing in map mode (codec_map.go:75-76)
        elif op.type == OP_BIND:
            val = mapping.get(op.field, b"")  # missing key → zero-value elem (codec_map.go:78-80)
            out += encode_typed("string", val, fmt.esc, strict_quirks=strict_quirks)
    return bytes(out)
