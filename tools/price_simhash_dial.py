"""Price the SimHash banding dial: pair counts + seconds at sf0.1 for
max_hamming 1/2/3 x width 16/64 over the dup-injected documents corpus
(the simhash_pairs gate input). A 100 TB user chooses recall vs cost
from this table deliberately (r3 verdict #5 / r4 #6): raising
max_hamming widens recall but multiplies band count C(bands_needed)
and band-collision volume; width 64 disperses buckets (fewer spurious
collisions per band) at 4x fingerprint bits.

Usage: python tools/price_simhash_dial.py [sf_dir] -> markdown table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngxspark.dedup import simhash_near_dup_pairs
from ngxspark.queries import _docs_with_dups
from ngxspark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app="simhash-dial", cores=32)
spark.sparkContext.setLogLevel("ERROR")

configs = [(w, k) for w in (16, 64) for k in (1, 2, 3)]
times = {c: [] for c in configs}
counts = {}
# INTERLEAVED reps (full sweep per round, not 3 consecutive runs per
# config): the box is bistable (CLAUDE.md), so consecutive per-config
# timing would let a window flip masquerade as a width/k cost difference
for _ in range(3):
    for width, k in configs:
        docs = _docs_with_dups(spark, sf_dir)  # rebuild per rep (AQE)
        t0 = time.perf_counter()
        counts[(width, k)] = simhash_near_dup_pairs(
            docs, max_hamming=k, width=width
        ).count()
        times[(width, k)].append(time.perf_counter() - t0)

print("| width | max_hamming | pairs | sec (median of 3, interleaved) |")
print("|---|---|---|---|")
for width, k in configs:
    med = sorted(times[(width, k)])[1]
    print(f"| {width} | {k} | {counts[(width, k)]} | {med:.2f} |")
spark.stop()
