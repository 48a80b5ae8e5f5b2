"""One-off deep render fuzz: scaled version of
test_render_lines_random_format_differential (more formats, more rows,
wider value alphabet incl. surrogate-adjacent + long strings)."""
import random
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ngxspark.fmtcompile import FormatError, compile_format
from ngxspark.oracle import encode_struct
from ngxspark.render import render_lines
from ngxspark.session import get_spark

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1234
n_formats = int(sys.argv[2]) if len(sys.argv) > 2 else 60

spark = get_spark(app="render-fuzz", cores=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
rng = random.Random(seed)
lit = list('ab"\\x un0:,-/ ')
vals = [None, "", "plain", 'q"uote', "back\\slash", "ctrl\x01x", "tab\tnl\n",
        "uni🌉", "\x00zero", "\x1f", "a" * 300, "mix\\\"\x02🌉", "\x7f", " lead trail "]
ints = [None, 0, -5, 2**62, -(2**63), 2**63 - 1, 1, 255]
tested = 0
while tested < n_formats:
    fs = rng.choice(["", "", "escape=json;", "escape=none;"]) + "".join(
        ("$" + rng.choice("abc")) if rng.random() < 0.5
        else "".join(rng.choice(lit) for _ in range(rng.randint(1, 3)))
        for _ in range(rng.randint(1, 6))
    )
    try:
        fmt = compile_format(fs)
    except FormatError:
        continue
    tested += 1
    bindings = {"a": "string", "b": "int64", "c": "string"}
    rows = [(i, rng.choice(vals), rng.choice(ints), rng.choice(vals)) for i in range(150)]
    df = spark.createDataFrame(rows, "i int, a string, b long, c string")
    got = {r.i: r.line for r in render_lines(df, fmt, bindings).select("i", "line").collect()}
    for i, a, b, c in rows:
        exp = encode_struct(
            fmt, bindings,
            {"a": a.encode() if isinstance(a, str) else a, "b": b,
             "c": c.encode() if isinstance(c, str) else c},
        ).decode("utf-8", "replace")
        assert got[i] == exp, f"fmt={fs!r} row {i}: {got[i]!r} != {exp!r}"
    # map mode: string values only; "$b"+"bb0" lexes as variable $bbb0, so
    # only formats whose bound vars are all in {a,b,c} can run over this df
    from ngxspark.oracle import bind_map, encode_map
    from ngxspark.fmtcompile import OP_BIND
    mapvars = {op.field for op in bind_map(fmt) if op.type == OP_BIND}
    if not mapvars <= {"a", "b", "c"}:
        continue
    mrows = [(i, rng.choice(vals), rng.choice(vals), rng.choice(vals)) for i in range(80)]
    mdf = spark.createDataFrame(mrows, "i int, a string, b string, c string")
    mgot = {r.i: r.line for r in render_lines(mdf, fmt, {}, mode="map").select("i", "line").collect()}
    for i, a, b, c in mrows:
        mexp = encode_map(
            fmt,
            {k: v.encode("utf-8", "surrogateescape")
             for k, v in {"a": a, "b": b, "c": c}.items() if v is not None},
        ).decode("utf-8", "replace")
        assert mgot[i] == mexp, f"MAP fmt={fs!r} row {i}: {mgot[i]!r} != {mexp!r}"
    if tested % 20 == 0:
        print(f"{tested} formats ok", flush=True)
print(f"DONE: {tested} random formats x 150 rows render differential, 0 diffs")
