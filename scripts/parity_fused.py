#!/usr/bin/env python3
"""Byte-parity + timing harness for fused-pyramid changes: builds the
z0-zN pyramid on a synthetic corpus and prints a tileset content hash
(sorted (z,x,y,sha) rolled into one sha256) plus the wall.  Run with
SUBTREE=0 to force the flat per-(zoom,tile) assignment for ground truth."""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tippecanoe_spark.session import get_spark
from tippecanoe_spark import features, geocode, minzoom, pyramid, synth
from tippecanoe_spark.config import TilingConfig

cpus = int(os.environ.get("CPUS", "32"))
pages = int(os.environ.get("PAGES", "20000"))
maxzoom = int(os.environ.get("MAXZOOM", "8"))
subtree = int(os.environ.get("SUBTREE", "3"))

spark = get_spark(app="parity", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
corpus_dir = os.path.join("/tmp", f"bench_corpus_{pages}")
if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
    synth.webpages(spark, pages, partitions=cpus * 4).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
corpus = spark.read.parquet(corpus_dir).repartition(cpus * 3)
cfg = TilingConfig(
    maxzoom=maxzoom, drop_densest_as_needed=True, subtree_depth=subtree
)
feats = features.serialize(geocode.geocode(corpus), cfg)
stamped = minzoom.stamp_minzoom(feats, cfg).persist()
stamped.count()
t0 = time.time()
from tippecanoe_spark import tile as tilemod

tiles = tilemod.tiles_fused(stamped, cfg)
rows = (
    tiles.select("z", "x", "y", F.sha2(F.col("tile"), 256).alias("h"))
    .collect()
)
wall = time.time() - t0
acc = hashlib.sha256()
for r in sorted(rows, key=lambda r: (r.z, r.x, r.y)):
    acc.update(f"{r.z}/{r.x}/{r.y}:{r.h};".encode())
print(f"n_tiles={len(rows)} wall={wall:.1f}s sha={acc.hexdigest()}")
spark.stop()
