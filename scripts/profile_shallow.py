#!/usr/bin/env python3
"""Profile the z0-z8 shallow pyramid kernel: runs the bench's shallow build
once with TCS_PROFILE=1 and merges the per-worker cProfile dumps."""
import glob
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for f in glob.glob("/tmp/kprof_*.prof"):
    os.remove(f)

os.environ["TCS_PROFILE"] = "1"

from tippecanoe_spark.session import get_spark
from tippecanoe_spark import features, geocode, minzoom, pyramid, synth
from tippecanoe_spark.config import TilingConfig

cpus = int(os.environ.get("CPUS", "32"))
pages = int(os.environ.get("PAGES", "100000"))
maxzoom = int(os.environ.get("MAXZOOM", "8"))

spark = get_spark(app="prof", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
corpus_dir = os.path.join("/tmp", f"bench_corpus_{pages}")
if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
    synth.webpages(spark, pages, partitions=cpus * 4).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
corpus = spark.read.parquet(corpus_dir).repartition(cpus * 3)
cfg = TilingConfig(maxzoom=maxzoom, drop_densest_as_needed=True)
feats = features.serialize(geocode.geocode(corpus), cfg)
stamped = minzoom.stamp_minzoom(feats, cfg).persist()
stamped.count()
t0 = time.time()
manifests = pyramid.build_pyramid(spark, stamped, cfg, out_dir=None, stamp=False)
wall = time.time() - t0
n_tiles = sum(m["n_tiles"] for m in manifests)
print(f"pyramid_sec={wall:.1f} n_tiles={n_tiles} tiles_per_sec={n_tiles/wall:.1f}")
spark.stop()

profs = glob.glob("/tmp/kprof_*.prof")
print(f"{len(profs)} profiles")
st = pstats.Stats(profs[0])
for f in profs[1:]:
    st.add(f)
st.sort_stats("cumulative").print_stats(35)
st.sort_stats("tottime").print_stats(35)
