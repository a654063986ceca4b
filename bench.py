#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line with per-query timings.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.  Measures (a) each correctness-gate query,
(b) the webtext feature pipeline (synth → geocode → serialize → minzoom
stamp) as features/sec, which is the ingest half of the north-star metric.

Usage: python3 bench.py [--pages N] [--cpus N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
    for i, a in enumerate(sys.argv):
        if a == "--pages":
            pages = int(sys.argv[i + 1])

    from tippecanoe_spark import features, geocode, minzoom, synth
    from tippecanoe_spark.queries import QUERIES
    from tippecanoe_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    t_all = time.time()

    for name, fn in QUERIES.items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    # webtext feature pipeline throughput
    t0 = time.time()
    pg = synth.webpages(spark, pages, partitions=int(CPUS) * 4)
    feats = features.serialize(geocode.geocode(pg))
    stamped = minzoom.stamp_minzoom(feats)
    n_feats = stamped.count()
    dt = time.time() - t0
    timings["webtext_pipeline"] = round(dt, 3)
    feats_per_sec = n_feats / dt if dt > 0 else 0.0

    total = round(time.time() - t_all, 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "features_per_sec": round(feats_per_sec, 1),
                "n_features": n_feats,
                "bench_pages": pages,
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
