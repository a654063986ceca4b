#!/usr/bin/env python3
"""Diagnose 8->32 scaling on the shallow z0-z8 build: run the same
100k-page pyramid at a given core count with the UI enabled, then dump
per-stage wall, total task time, and max task time from the REST API.

If sum(task_time) is ~equal at 8 and 32 cores but wall shrinks only
2.4x, look at max-task (straggler) vs executor occupancy.
If sum(task_time) INFLATES at 32 cores, it's memory-bandwidth/GIL-ish
contention, not scheduling.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
pages = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
maxzoom = int(sys.argv[3]) if len(sys.argv) > 3 else 8

from tippecanoe_spark.session import get_spark

spark = get_spark(
    app=f"probe{cpus}",
    master=f"local[{cpus}]",
    shuffle_partitions=cpus,
    extra={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
spark.sparkContext.setLogLevel("ERROR")

from tippecanoe_spark import features, geocode, minzoom, pyramid, synth
from tippecanoe_spark.config import TilingConfig

corpus_dir = os.path.join("/tmp", f"bench_corpus_{pages}")
if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
    synth.webpages(spark, pages, partitions=cpus * 4).write.mode(
        "overwrite"
    ).parquet(corpus_dir)

cfg = TilingConfig(maxzoom=maxzoom, drop_densest_as_needed=True)
spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(
    lambda it: it, schema="id long"
).count()
corpus = spark.read.parquet(corpus_dir).repartition(cpus * 3)
feats = features.serialize(geocode.geocode(corpus), cfg)
stamped = minzoom.stamp_minzoom(feats, cfg).persist()
stamped.count()

# warm run (unmeasured), then measured run
pyramid.build_pyramid(spark, stamped, cfg, out_dir=None, stamp=False)
mark = time.time()
t0 = time.time()
pyramid.build_pyramid(spark, stamped, cfg, out_dir=None, stamp=False)
wall = time.time() - t0

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4049/api/v1/applications/{app_id}"
stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
rows = []
for st in stages:
    sub = st.get("submissionTime", "")
    # keep only stages from the measured run (after `mark`)
    try:
        subts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) + float("0." + sub[20:23] if len(sub) > 20 else 0)
    except Exception:
        subts = 0
    if subts < mark - 1:
        continue
    sid = st["stageId"]
    att = st["attemptId"]
    tl = json.load(urllib.request.urlopen(
        f"{base}/stages/{sid}/{att}/taskList?length=5000"))
    durs = [t.get("duration", 0) / 1000.0 for t in tl]
    if not durs:
        continue
    rows.append({
        "stage": sid,
        "name": st["name"].split("\n")[0][:60],
        "n_tasks": len(durs),
        "wall_est": round(st.get("executorRunTime", 0) / 1000.0, 1),
        "sum_task_s": round(sum(durs), 1),
        "max_task_s": round(max(durs), 1),
        "p50_task_s": round(sorted(durs)[len(durs) // 2], 2),
    })
rows.sort(key=lambda r: -r["sum_task_s"])
print(json.dumps({"cpus": cpus, "pyramid_wall": round(wall, 2),
                  "stages": rows[:12]}, indent=1))
spark.stop()
