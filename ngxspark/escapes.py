"""Escape kernels for the three nginx log_format dialects.

Byte-exact reimplementation of the reference escape module
(/root/reference/escape.go). Used by the pure-Python oracle and by the
driver-side render/generator paths; the vectorized Spark parse stage only
invokes these for lines that contain a backslash (the fast regex path is
provably equivalent on backslash-free lines).

Dialects: default (``\\``, ``\"``, ``\\xHH`` for control bytes), json (full
JSON escapes incl. UTF-16 surrogate pairs), none (identity).

Known reference quirk replicated when ``strict_quirks=True`` (the default for
oracle parity): json-escaping a control char other than ``\\n \\r \\t \\b \\f``
emits ``\\00uXX`` — bytes ``'0','0','u'`` then two hex digits
(escape.go:204-214), a transposition of the intended ``\\u00XX``.
"""

from __future__ import annotations

ESC_DEFAULT = 0
ESC_JSON = 1
ESC_NONE = 2

NIL_TOKEN = {ESC_DEFAULT: b"-", ESC_JSON: b"null", ESC_NONE: b""}


class EscapeError(ValueError):
    """Unescape failure — maps to a whole-row parse reject."""


_DEFAULT_ESCAPE_CHARS = frozenset(b'\\"x')
_JSON_ESCAPE_CHARS = frozenset(b'\\"nrtbfu/')

_HEX = [-1] * 256
for _i in range(256):
    _c = chr(_i)
    if "a" <= _c <= "f":
        _HEX[_i] = _i - ord("a") + 10
    elif "A" <= _c <= "F":
        _HEX[_i] = _i - ord("A") + 10
    elif "0" <= _c <= "9":
        _HEX[_i] = _i - ord("0")


def is_escape_char(esc: int, ch: int) -> bool:
    """Whether a literal starting with byte ``ch`` is an ESC_STRING (escape.go:33-52)."""
    if esc == ESC_DEFAULT:
        return ch in _DEFAULT_ESCAPE_CHARS
    if esc == ESC_JSON:
        return ch in _JSON_ESCAPE_CHARS
    return False


def nil_token(esc: int) -> bytes:
    return NIL_TOKEN[esc]


def escape(esc: int, buf: bytes, strict_quirks: bool = True) -> bytes:
    if esc == ESC_DEFAULT:
        return escape_default(buf)
    if esc == ESC_JSON:
        return escape_json(buf, strict_quirks=strict_quirks)
    return buf


def unescape(esc: int, buf: bytes) -> bytes:
    if esc == ESC_DEFAULT:
        return unescape_default(buf)
    if esc == ESC_JSON:
        return unescape_json(buf)
    return buf


def escape_default(buf: bytes) -> bytes:
    """default-dialect escape (escape.go:103-132): \\xHH for <0x20, backslash for \\ and \"."""
    if not buf:
        return buf
    out = bytearray()
    for ch in buf:
        if ch < 0x20:
            out += b"\\x"
            out.append(ord("0") + (ch >> 4))
            lo = ch & 0xF
            out.append(ord("0") + lo if lo < 10 else ord("A") + lo - 10)
        else:
            if ch in (0x5C, 0x22):  # '\\' or '"'
                out.append(0x5C)
            out.append(ch)
    return bytes(out)


def unescape_default(buf: bytes) -> bytes:
    """default-dialect unescape (escape.go:134-179); raises EscapeError with the reference's messages."""
    if not buf:
        return buf
    out = bytearray()
    length = len(buf)
    i = 0
    while i < length:
        backslash = buf.find(b"\\", i)
        if backslash < 0:
            out += buf[i:]
            break
        out += buf[i:backslash]
        backslash += 1
        if backslash >= length:
            raise EscapeError("found EOF while unescaping '\\' format")
        ch = buf[backslash]
        if ch in (0x5C, 0x22):
            out.append(ch)
        elif ch == ord("x"):
            if backslash + 2 < length:
                h1, h2 = _HEX[buf[backslash + 1]], _HEX[buf[backslash + 2]]
                if h1 >= 0 and h2 >= 0:
                    out.append((h1 << 4) | h2)
                    backslash += 2
                else:
                    raise EscapeError(
                        "found invalid hex escape format \\x%c%c"
                        % (chr(buf[backslash + 1]), chr(buf[backslash + 2]))
                    )
            else:
                raise EscapeError("found EOF while unescaping '\\x??' format")
        else:
            raise EscapeError("found unknown escape format '\\%c'" % chr(ch))
        i = backslash + 1
    return bytes(out)


def escape_json(buf: bytes, strict_quirks: bool = True) -> bytes:
    """json-dialect escape (escape.go:181-227). See module docstring for the \\00uXX quirk."""
    if not buf:
        return buf
    out = bytearray()
    for ch in buf:
        if ch < 0x20:
            out.append(0x5C)
            if ch == 0x0A:
                out.append(ord("n"))
            elif ch == 0x0D:
                out.append(ord("r"))
            elif ch == 0x09:
                out.append(ord("t"))
            elif ch == 0x08:
                out.append(ord("b"))
            elif ch == 0x0C:
                out.append(ord("f"))
            else:
                out += b"00u" if strict_quirks else b"u00"
                out.append(ord("0") + (ch >> 4))
                lo = ch & 0xF
                out.append(ord("0") + lo if lo < 10 else ord("A") + lo - 10)
        else:
            if ch in (0x5C, 0x22):
                out.append(0x5C)
            out.append(ch)
    return bytes(out)


_SURROGATE_MIN = 0xD800
_SURROGATE_MAX = 0xDFFF
_MAX_RUNE = 0x10FFFF
_RUNE_ERROR = 0xFFFD


def _append_rune(out: bytearray, r: int) -> None:
    """Manual UTF-8 encoder with the reference's U+FFFD policy (escape.go:342-362).

    Surrogate halves and out-of-range runes encode as U+FFFD.
    """
    if r <= 0x7F:
        out.append(r & 0xFF)
    elif r <= 0x7FF:
        out.append(0xC0 | (r >> 6))
        out.append(0x80 | (r & 0x3F))
    else:
        if r > _MAX_RUNE or _SURROGATE_MIN <= r <= _SURROGATE_MAX:
            r = _RUNE_ERROR
        if r <= 0xFFFF:
            out.append(0xE0 | (r >> 12))
            out.append(0x80 | ((r >> 6) & 0x3F))
            out.append(0x80 | (r & 0x3F))
        else:
            out.append(0xF0 | (r >> 18))
            out.append(0x80 | ((r >> 12) & 0x3F))
            out.append(0x80 | ((r >> 6) & 0x3F))
            out.append(0x80 | (r & 0x3F))


def _decode_surrogate_pair(r1: int, r2: int) -> int:
    """utf16.DecodeRune: combine a surrogate pair; U+FFFD if not a valid pair."""
    if 0xD800 <= r1 <= 0xDBFF and 0xDC00 <= r2 <= 0xDFFF:
        return (((r1 - 0xD800) << 10) | (r2 - 0xDC00)) + 0x10000
    return _RUNE_ERROR


def unescape_json(buf: bytes) -> bytes:
    """json-dialect unescape (escape.go:229-316) incl. surrogate-pair handling."""
    if not buf:
        return buf
    out = bytearray()
    length = len(buf)
    i = 0
    while i < length:
        backslash = buf.find(b"\\", i)
        if backslash < 0:
            out += buf[i:]
            break
        out += buf[i:backslash]
        backslash += 1
        if backslash >= length:
            raise EscapeError("found EOF while unescaping '\\' format")
        ch = buf[backslash]
        if ch in (0x5C, 0x22, 0x2F):  # \\ \" \/
            out.append(ch)
        elif ch == ord("n"):
            out.append(0x0A)
        elif ch == ord("r"):
            out.append(0x0D)
        elif ch == ord("t"):
            out.append(0x09)
        elif ch == ord("b"):
            out.append(0x08)
        elif ch == ord("f"):
            out.append(0x0C)
        elif ch == ord("u"):
            if backslash + 4 < length:
                hs = [_HEX[buf[backslash + j]] for j in range(1, 5)]
                if all(h >= 0 for h in hs):
                    r = 0
                    for h in hs:
                        r = (r << 4) | h
                    if _SURROGATE_MIN <= r <= _SURROGATE_MAX:
                        nxt = backslash + 5
                        if nxt + 5 < length and buf[nxt] == 0x5C and buf[nxt + 1] == ord("u"):
                            hs2 = [_HEX[buf[nxt + j]] for j in range(2, 6)]
                            if all(h >= 0 for h in hs2):
                                r2 = 0
                                for h in hs2:
                                    r2 = (r2 << 4) | h
                                combined = _decode_surrogate_pair(r, r2)
                                if combined == _RUNE_ERROR:
                                    _append_rune(out, r)
                                    _append_rune(out, r2)
                                else:
                                    _append_rune(out, combined)
                                backslash = nxt + 1
                            else:
                                raise EscapeError(
                                    "found invalid unicode escape format \\u%c%c%c%c"
                                    % tuple(chr(buf[nxt + j]) for j in range(2, 6))
                                )
                        else:
                            _append_rune(out, r)  # unpaired surrogate → U+FFFD
                    else:
                        _append_rune(out, r)
                    backslash += 4
                else:
                    raise EscapeError(
                        "found invalid unicode escape format \\u%c%c%c%c"
                        % tuple(chr(buf[backslash + j]) for j in range(1, 5))
                    )
            else:
                raise EscapeError("found EOF while unescaping '\\u??' format")
        else:
            raise EscapeError("found unknown escape format '\\%c'" % chr(ch))
        i = backslash + 1
    return bytes(out)
