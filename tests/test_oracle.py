"""Round-trip fixtures against the pure-Python oracle interpreter.

Mirrors TestStructCodec / TestMapCodec (/root/reference/ngx_test.go:50-130):
decode must equal the expected record/map, and re-encoding the decoded
value must reproduce the exact marshaled line.
"""

import pytest

from ngxspark.fmtcompile import compile_format
from ngxspark.oracle import (
    DecodeError,
    decode_map,
    decode_struct,
    encode_map,
    encode_struct,
)
from tests.fixtures import (
    ACCESS_BINDINGS,
    DECODE_REJECTS,
    POSITIVE_MAP,
    POSITIVE_STRUCT,
)


@pytest.mark.parametrize("fmt,data,expected,marshaled", POSITIVE_STRUCT)
def test_struct_roundtrip(fmt, data, expected, marshaled):
    ngx = compile_format(fmt)
    got = decode_struct(ngx, ACCESS_BINDINGS, data.encode("utf-8"))
    assert got == expected
    assert encode_struct(ngx, ACCESS_BINDINGS, got) == marshaled.encode("utf-8")


@pytest.mark.parametrize("fmt,data,expected,marshaled", POSITIVE_MAP)
def test_map_roundtrip(fmt, data, expected, marshaled):
    ngx = compile_format(fmt)
    got = decode_map(ngx, data.encode("utf-8"))
    assert got == expected
    assert encode_map(ngx, got) == marshaled.encode("utf-8")


@pytest.mark.parametrize("fmt,bindings,data,err_substr", DECODE_REJECTS)
def test_decode_rejects(fmt, bindings, data, err_substr):
    ngx = compile_format(fmt)
    with pytest.raises(DecodeError) as ei:
        decode_struct(ngx, bindings, data.encode("utf-8"))
    assert err_substr in str(ei.value)


def test_trailing_bound_var_consumes_rest():
    ngx = compile_format("x=$x")
    assert decode_map(ngx, b"x=a=b=c rest of line") == {"x": b"a=b=c rest of line"}


def test_trailing_unbound_var_returns_early():
    ngx = compile_format("x=$_")
    assert decode_map(ngx, b"x=anything at all") == {}


def test_trailing_literal_ignores_junk():
    """No trailing-junk check when the op list ends in a literal."""
    ngx = compile_format("$a!")
    assert decode_map(ngx, b"v!and then junk") == {"a": b"v"}


def test_first_occurrence_delimiter():
    """Variable ends at the FIRST occurrence of the next literal (bytes.Index)."""
    ngx = compile_format("$a - $b")
    assert decode_map(ngx, b"x - y - z") == {"a": b"x", "b": b"y - z"}


def test_duplicate_var_map_last_wins():
    ngx = compile_format("$v-$v;")
    assert decode_map(ngx, b"a-b;") == {"v": b"b"}


def test_duplicate_var_struct_binds_last_only():
    """supported keeps the last index, so the first occurrence stays a discard."""
    ngx = compile_format("$v-$v;")
    got = decode_struct(ngx, {"v": "string"}, b"a-b;")
    assert got == {"v": b"b"}


def test_backslash_retry_default_dialect():
    """default dialect: candidate delimiter preceded by '\\' is always skipped."""
    ngx = compile_format('\\$a\\"$b\\"')
    # value of a contains an escaped quote; the \" delimiter must skip it
    assert decode_map(ngx, b'\\x\\\\\\"y\\"z\\"') == {"a": b'x\\"y', "b": b"z"}


def test_json_retry_accepts_clean_unescape():
    """json dialect: a backslash-preceded candidate is accepted iff the
    window unescapes cleanly (codec_struct.go:146-151)."""
    ngx = compile_format('escape=json;"$a"')
    assert decode_map(ngx, b'"x\\\\"') == {"a": b"x\\"}


def test_whole_row_reject_on_bad_escape():
    ngx = compile_format("v=$v;")
    with pytest.raises(DecodeError, match="unknown escape"):
        decode_struct(ngx, {"v": "string"}, b"v=\\q;")


def test_unbound_var_encodes_nil_token():
    """Struct-mode Marshal: unbound var → dialect nil (codec_struct.go:59-60)."""
    ngx = compile_format("a=$a b=$b")
    out = encode_struct(ngx, {"a": "string"}, {"a": b"X"})
    assert out == b"a=X b=-"
    ngx = compile_format("escape=json;a=$a b=$b")
    out = encode_struct(ngx, {"a": "string"}, {"a": b"X"})
    assert out == b"a=X b=null"
    ngx = compile_format("escape=none;a=$a b=$b")
    out = encode_struct(ngx, {"a": "string"}, {"a": b"X"})
    assert out == b"a=X b="


def test_typed_casts():
    ngx = compile_format("$s $i $b $u")
    bindings = {"s": "string", "i": "int", "b": "bool", "u": "uint32"}
    got = decode_struct(ngx, bindings, b"hey -42 TRUE 7")
    assert got == {"s": b"hey", "i": -42, "b": True, "u": 7}
    # bool never errors: anything non-'true' is False (codec.go:273-280)
    got = decode_struct(ngx, bindings, b"x 1 yes 0")
    assert got["b"] is False
    # uint rejects signs
    with pytest.raises(DecodeError, match="ParseUint"):
        decode_struct(ngx, bindings, b"x 1 true +7")


def test_control_char_escape_roundtrip_default():
    ngx = compile_format("v=$v;")
    out = encode_struct(ngx, {"v": "string"}, {"v": b"a\x01b"})
    assert out == b"v=a\\x01b;"
    back = decode_struct(ngx, {"v": "string"}, out)
    assert back == {"v": b"a\x01b"}


def test_json_control_quirk():
    """escape.go:205-214 quirk: control chars (not nrtbf) emit \\00uXX."""
    ngx = compile_format("escape=json;v=$v;")
    out = encode_struct(ngx, {"v": "string"}, {"v": b"\x01"})
    assert out == b"v=\\00u01;"
    # with quirks disabled the renderer emits proper \u00XX
    out2 = encode_struct(ngx, {"v": "string"}, {"v": b"\x01"}, strict_quirks=False)
    assert out2 == b"v=\\u0001;"


def test_unsupported_type_absent_from_format_succeeds():
    """codec_struct.go:34-42 builds codecs only for fields present in
    ngx.supported — a struct field with an unsupported type that is ABSENT
    from the format must succeed (and stay at its zero value), while the
    same type bound to a present variable must raise."""
    from ngxspark.fmtcompile import compile_format
    from ngxspark.oracle import EncodeError, decode_struct
    from ngxspark.plan import plan_struct

    fmt = compile_format("a=$a;")
    got = decode_struct(fmt, {"a": "string", "ghost": "float64"}, b"a=x;")
    assert got["a"] == b"x" and got["ghost"] is None

    with pytest.raises(EncodeError):
        decode_struct(fmt, {"a": "float64"}, b"a=x;")

    plan = plan_struct(fmt, {"a": "string", "ghost": "float64"})
    import pandas as pd
    from ngxspark.parse import make_parse_fn

    res = make_parse_fn(plan)(pd.Series(["a=x;"], dtype="object"))
    assert res["_matched"][0] and res["a"][0] == "x" and res["ghost"][0] is None

    with pytest.raises(ValueError):
        plan_struct(fmt, {"a": "float64"})
