"""Dump .explain("formatted") for queries into plans/r07/<q>_<tag>.txt.

Usage: python tools/dump_plans_r07.py <tag> [query ...]
(tag is e.g. "before" or "after"; default queries = the full registry.)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from ngxspark import queries as Q
    from ngxspark.session import get_spark

    spark = get_spark(app="ngxspark-plans-r07")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    for name in names or list(qs):
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt", flush=True)


if __name__ == "__main__":
    main()
