"""Fixture corpus ported verbatim from the reference tests.

Sources: /root/reference/ngx_test.go:9-48 (struct + map round-trips) and
/root/reference/compile_test.go:5-29 (compile accept/reject). Go backquoted
raw literals are transcribed with explicit Python escapes; expected values
are bytes (the reference operates on raw bytes).
"""

from ngxspark.fmtcompile import COMBINED_FMT

# Access struct bindings (reference: ngx.go:22-34)
ACCESS_BINDINGS = {
    "remote_addr": "string",
    "remote_user": "string",
    "time_local": "string",
    "request": "string",
    "status": "int",
    "bytes_sent": "int",
    "body_bytes_sent": "int",
    "http_referer": "string",
    "http_user_agent": "string",
    "http_cookie": "string",
    "request_body": "string",
}

ACCESS_ZERO = {
    "remote_addr": b"",
    "remote_user": b"",
    "time_local": b"",
    "request": b"",
    "status": 0,
    "bytes_sent": 0,
    "body_bytes_sent": 0,
    "http_referer": b"",
    "http_user_agent": b"",
    "http_cookie": b"",
    "request_body": b"",
}


def access(**kw):
    d = dict(ACCESS_ZERO)
    d.update(kw)
    return d


# (fmt, data, expected_record, marshaled) — ngx_test.go:9-18
POSITIVE_STRUCT = [
    (
        COMBINED_FMT,
        '$remote_addr - $remote_user [$time_local] "$request" 200 0 '
        '"$http_referer" "$http_user_agent"',
        access(
            remote_addr=b"$remote_addr",
            remote_user=b"$remote_user",
            time_local=b"$time_local",
            request=b"$request",
            status=200,
            body_bytes_sent=0,
            http_referer=b"$http_referer",
            http_user_agent=b"$http_user_agent",
        ),
        '$remote_addr - $remote_user [$time_local] "$request" 200 0 '
        '"$http_referer" "$http_user_agent"',
    ),
    (
        'escape=json;{"$request":"$request_body"}',
        '{"$request\\\\":"$request_body\\""}',
        access(request=b"$request\\", request_body=b'$request_body"'),
        '{"$request\\\\":"$request_body\\""}',
    ),
    (
        'escape=json;{"$request":"$request_body"}',
        '{"$request\\\\\\"":"$request_body\\"\\\\"}',
        access(request=b'$request\\"', request_body=b'$request_body"\\'),
        '{"$request\\\\\\"":"$request_body\\"\\\\"}',
    ),
]

# (fmt, data, expected_map, marshaled) — ngx_test.go:20-48
POSITIVE_MAP = [
    (
        COMBINED_FMT,
        COMBINED_FMT,
        {
            "remote_addr": b"${remote_addr}",
            "remote_user": b"${remote_user}",
            "time_local": b"$time_local",
            "request": b"${request}",
            "status": b"${status}",
            "body_bytes_sent": b"${body_bytes_sent}",
            "http_referer": b"${http_referer}",
            "http_user_agent": b"${http_user_agent}",
        },
        COMBINED_FMT,
    ),
    (
        "\\$request\\$request_body\\$header_cookie\\",
        "\\request\\request_body\\header_cookie\\",
        {
            "request": b"request",
            "request_body": b"request_body",
            "header_cookie": b"header_cookie",
        },
        "\\request\\request_body\\header_cookie\\",
    ),
    (
        '\\$request\\"$request_body\\"\\"$header_cookie\\"',
        '\\request\\"request_body\\"\\"header_cookie\\"',
        {
            "request": b"request",
            "request_body": b"request_body",
            "header_cookie": b"header_cookie",
        },
        '\\request\\"request_body\\"\\"header_cookie\\"',
    ),
    (
        '\\$request\\"$request_body\\"\\"$header_cookie\\"',
        '\\requ\\\\\\"est\\"request_body\\"\\"header_cookie\\"',
        {
            "request": b'requ\\"est',
            "request_body": b"request_body",
            "header_cookie": b"header_cookie",
        },
        '\\requ\\\\\\"est\\"request_body\\"\\"header_cookie\\"',
    ),
    (
        '\\$request\\"${request_body}a\\"\\"$header_cookie\\"',
        '\\requ\\\\\\"est\\"request_bodya\\"\\"header_cookie\\"',
        {
            "request": b'requ\\"est',
            "request_body": b"request_body",
            "header_cookie": b"header_cookie",
        },
        '\\requ\\\\\\"est\\"request_bodya\\"\\"header_cookie\\"',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"$key":"$value"}',
        {"key": b"$key", "value": b"$value"},
        '{"$key":"$value"}',
    ),
    (
        'escape=json;{"$key":"$_"}',
        '{"$key":"$value"}',
        {"key": b"$key"},
        '{"$key":""}',
    ),
    (
        'escape=json;{"$key":$_"$value"}$_',
        '{"$key":    "$value"}',
        {"key": b"$key", "value": b"$value"},
        '{"$key":"$value"}',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"\\u0024k\\u0065y":"\\r\\f\\t\\uf755\\n"}',
        {"key": b"$key", "value": b"\r\x0c\t" + "".encode() + b"\n"},
        '{"$key":"\\r\\f\\t\\n"}',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"\\u0024k\\u0065\\u0079":"\\ud83c\\udf09"}',
        {"key": b"$key", "value": "🌉".encode()},
        '{"$key":"🌉"}',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"\\u0024k\\u0065\\u0079":"surrogate pair : \\ud83c\\udf09"}',
        {"key": b"$key", "value": "surrogate pair : 🌉".encode()},
        '{"$key":"surrogate pair : 🌉"}',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"\\u0024k\\u0065\\u0079":"\\ud83c\\udf09\\ud83c\\udf09is\\u0020surrogate\\u0020pair"}',
        {"key": b"$key", "value": "🌉🌉is surrogate pair".encode()},
        '{"$key":"🌉🌉is surrogate pair"}',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"\\u0024k\\u0065\\u0079":"\\ud83c\\udf09\\ud83c\\udf09\\ud83c\\udf09\\ud83c\\udf09\\""}',
        {"key": b"$key", "value": "🌉🌉🌉🌉".encode() + b'"'},
        '{"$key":"🌉🌉🌉🌉\\""}',
    ),
    (
        'escape=json;{"$$$key":"$$$value"}',
        '{"$key":"$value"}',
        {"key": b"key", "value": b"value"},
        '{"$key":"$value"}',
    ),
    (
        'escape=json;{"$$${key}":"$$${value}"}',
        '{"$key":"$value"}',
        {"key": b"key", "value": b"value"},
        '{"$key":"$value"}',
    ),
    (
        "$$key=$key, $$value=$value",
        "$key=hello, $value=world",
        {"key": b"hello", "value": b"world"},
        "$key=hello, $value=world",
    ),
    (
        "$$$$key=$key, $$value=$value",
        "$$key=hello, $value=world",
        {"key": b"hello", "value": b"world"},
        "$$key=hello, $value=world",
    ),
    (
        "$$ $$$$key=$key, $$value=$value",
        "$ $$key=hello, $value=world",
        {"key": b"hello", "value": b"world"},
        "$ $$key=hello, $value=world",
    ),
    (
        "$$ $$$$key=$key, $$value=$value",
        "$ $$key=\\x68\\x65\\x6c\\x6c\\x6f, $value=\\x77\\x6f\\x72\\x6c\\x64",
        {"key": b"hello", "value": b"world"},
        "$ $$key=hello, $value=world",
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"$key\\\\":"$value\\""}',
        {"key": b"$key\\", "value": b'$value"'},
        '{"$key\\\\":"$value\\""}',
    ),
    (
        'escape=json;{"$key":"$value"}',
        '{"$key\\\\\\"":"$value\\"\\\\"}',
        {"key": b'$key\\"', "value": b'$value"\\'},
        '{"$key\\\\\\"":"$value\\"\\\\"}',
    ),
    (
        'escape=json;{"${key}":"${value}"}',
        '{"$key\\\\\\"":"$value\\"\\\\"}',
        {"key": b'$key\\"', "value": b'$value"\\'},
        '{"$key\\\\\\"":"$value\\"\\\\"}',
    ),
]

# compile_test.go:5-17
POSITIVE_FORMATS = [
    COMBINED_FMT,
    '$request "$request_body""$header_cookie"',
    '$request "$request_body" "$header_cookie"',
    '\\$request "$request_body" "$header_cookie"',
    '\\$request "$request_body" "$header_cookie"',
    '\\$request\\"$request_body\\"\\"$header_cookie\\"',
    'escape=json ; $request "$request_body""$header_cookie"',
    'escape=none ; $request "$request_body""$header_cookie"',
    'escape=default           \t\t; $request "$request_body" "$header_cookie"',
    'escape=json;$request "$request_body""$header.cookie"',
    'escape=json;$request "$request_body""$header.cookie"$$',
]

# compile_test.go:19-29
NEGATIVE_FORMATS = [
    'escape=json$request "$request_body""$header_cookie"',
    'escape=json;${request "$request_body""$header_cookie"',
    'escape=json $request "$request_body""$header_cookie"',
    'escape=unknown ;$request "$request_body""$header_cookie"',
    'escape=json;$request "$request_body""$.cookie"',
    'escape=json;$request "$request_body.""$cookie"',
    'escape=json;$request "$request_body""$header..cookie"',
    'escape=json;$request "$request_body""$header....cookie"',
    'escape=json;$request "$request_body""$header.cookie"$',
]

# Decode-reject corpus (derived from the reference error paths, FIXTURES.md §3)
DECODE_REJECTS = [
    # (fmt, bindings, data, error_substring)
    (COMBINED_FMT, ACCESS_BINDINGS, "nonsense without dashes", "got unexpected"),
    (
        COMBINED_FMT,
        ACCESS_BINDINGS,
        '1.2.3.4 - u [t] "GET / HTTP/1.1" abc 0 "-" "ua"',
        'field "status" strconv.ParseInt: parsing "abc": invalid syntax',
    ),
    (
        COMBINED_FMT,
        ACCESS_BINDINGS,
        '1.2.3.4 - u [t] "GET / HTTP/1.1" 200 99999999999999999999 "-" "ua"',
        "value out of range",
    ),
    (
        COMBINED_FMT,
        ACCESS_BINDINGS,
        "1.2.3.4 - u [t] \"GET / HTTP/1.1\" 200 0",
        "got unexpected EOF",
    ),
    (
        "$a=$b",
        {"a": "string", "b": "string"},
        "x+y",
        'got unexpected EOF: expecting "=" after $a',
    ),
    (
        "v=$v;",
        {"v": "string"},
        "v=\\q;",
        "found unknown escape format",
    ),
]
