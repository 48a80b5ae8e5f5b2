"""log_format template → op-program compiler.

Pure Python, no Spark dependency; runs once on the driver. Reproduces the
exact accept/reject semantics of the reference compiler
(/root/reference/compile.go:28-174), including:

* the ``escape=json|default|none`` prefix with optional whitespace then a
  mandatory ``;`` (compile.go:35-61),
* ``$$`` → literal ``$`` (compile.go:72-76),
* bare ``$var`` and bracketed ``${var}`` forms, variable charset
  ``[A-Za-z0-9_.]`` (compile.go:96-108),
* dot rules: no leading/trailing dot, no ``..`` (compile.go:126-134),
* adjacent-variable dedup: a variable immediately following another
  variable is dropped (compile.go:135-138),
* duplicate variable names: ``supported[name]`` keeps the LAST op index
  (compile.go:139),
* literal classification into STRING vs ESC_STRING by whether the first
  byte is an escape-relevant char for the active dialect
  (compile.go:84-93 → escape.go:33-52).

All scanning is done over the UTF-8 byte form of the template, matching the
reference's byte-wise cursor.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ngxspark.escapes import ESC_DEFAULT, ESC_JSON, ESC_NONE, is_escape_char

# Op types (reference: compile.go:10-16)
OP_STRING = 1      # literal text; also the delimiter terminating the previous var
OP_ESC_STRING = 2  # literal whose first byte is escape-relevant for the dialect
OP_VARIABLE = 3    # variable scanned past and discarded
OP_BIND = 4        # variable bound to an output field (set by plan binding)


class FormatError(ValueError):
    """Raised on an invalid log_format template (reference: ErrInvalidLogFormat etc.)."""


ERR_INVALID_LOG_FORMAT = "Invalid log format"
ERR_UNKNOWN_ESCAPING = "Unknown log format escaping"

_VARNAME_BYTES = frozenset(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_."
)
_WS_BYTES = frozenset(b" \r\n\t\v\f")


@dataclass(frozen=True)
class Op:
    type: int
    extra: bytes  # literal bytes for STRING/ESC_STRING; var name for VARIABLE/BIND


@dataclass(frozen=True)
class LogFormat:
    """Compiled format: op list + escape dialect + var→op-index map."""

    ops: tuple[Op, ...]
    esc: int
    supported: dict[str, int] = field(default_factory=dict)

    @property
    def variables(self) -> list[str]:
        """All variable names in op order (duplicates included, `_` included)."""
        return [op.extra.decode("utf-8") for op in self.ops if op.type == OP_VARIABLE]


# nginx combined format (reference: ngx.go:18)
COMBINED_FMT = (
    "${remote_addr} - ${remote_user} [$time_local] \"${request}\" "
    "${status} ${body_bytes_sent} \"${http_referer}\" \"${http_user_agent}\""
)

def compile_format(logfmt: str) -> LogFormat:
    """Compile a log_format template. Raises FormatError on invalid input."""
    data = logfmt.encode("utf-8")
    p = 0
    esc = ESC_DEFAULT
    ops: list[Op] = []
    supported: dict[str, int] = {}

    if data.startswith(b"escape="):
        p += 7
        if data[p:].startswith(b"json"):
            p += 4
            esc = ESC_JSON
        elif data[p:].startswith(b"default"):
            p += 7
            esc = ESC_DEFAULT
        elif data[p:].startswith(b"none"):
            p += 4
            esc = ESC_NONE
        else:
            raise FormatError(ERR_UNKNOWN_ESCAPING)
        # skip optional whitespace then require ';' (compile.go:49-60)
        while p < len(data):
            ch = data[p]
            if ch in _WS_BYTES:
                p += 1
            elif ch == ord(";"):
                p += 1
                break
            else:
                esc_name = {ESC_DEFAULT: "default", ESC_JSON: "json", ESC_NONE: "none"}[esc]
                raise FormatError(f"expecting ';' after escape={esc_name}")

    last = bytearray()

    def flush_literal() -> None:
        if last:
            lit = bytes(last)
            typ = OP_ESC_STRING if is_escape_char(esc, lit[0]) else OP_STRING
            ops.append(Op(typ, lit))
            last.clear()

    q = p
    while p < len(data):
        if data[p] == ord("$"):
            p += 1
            bracket = False
            if p >= len(data):
                raise FormatError(ERR_INVALID_LOG_FORMAT)
            if data[p] == ord("$"):
                last.append(ord("$"))
                p += 1
                q = p
                continue
            elif data[p] == ord("{"):
                bracket = True
                p += 1
                if p >= len(data):
                    raise FormatError(ERR_INVALID_LOG_FORMAT)
            flush_literal()
            # lex variable name (compile.go:96-108)
            q = p
            while p < len(data):
                ch = data[p]
                if bracket and ch == ord("}"):
                    p += 1
                    bracket = False
                    break
                if ch in _VARNAME_BYTES:
                    p += 1
                    continue
                break
            if bracket:
                raise FormatError(
                    f"the closing bracket of variable \"{data[q:p].decode('utf-8', 'replace')}\" is missing"
                )
            varname = data[q:p]
            if len(varname) <= 0 or varname == b"}":
                raise FormatError(ERR_INVALID_LOG_FORMAT)
            if varname.endswith(b"}"):
                varname = varname[:-1]
            if len(varname) <= 0:
                raise FormatError(ERR_INVALID_LOG_FORMAT)
            name = varname.decode("utf-8")
            if name.startswith("."):
                raise FormatError(f"variable \"{name}\" cannot start with '.'")
            if name.endswith("."):
                raise FormatError(f"variable \"{name}\" cannot end with '.'")
            if ".." in name:
                raise FormatError(f"variable \"{name}\" cannot have consecutive dots")
            pos = len(ops)
            if pos > 0 and ops[pos - 1].type == OP_VARIABLE:
                pass  # adjacent-variable dedup (compile.go:135-138)
            else:
                supported[name] = pos  # last duplicate wins (compile.go:139)
                ops.append(Op(OP_VARIABLE, varname))
            q = p
        else:
            nxt = data.find(b"$", q)
            if nxt > q:
                last.extend(data[q:nxt])
                q = nxt
                p = q
            elif nxt < 0:
                last.extend(data[q:])
                break
            else:  # nxt == q, '$' at cursor: loop re-enters the '$' branch
                p = q

    flush_literal()
    return LogFormat(ops=tuple(ops), esc=esc, supported=supported)
