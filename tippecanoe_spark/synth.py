"""Deterministic synthetic web-page corpus (the north-rule input table).

Schema (BASELINE.json input_hint): ``url string, warc_ts timestamp,
html binary, text string, lang string``.  Rows are a pure function of the
row index ``i`` (FIXTURES.md §1), so the corpus is identical regardless of
partitioning / parallelism — which is what makes the "byte-identical
extracted text per url" invariant and the local[8]-vs-local[32]
equivalence tests meaningful.

``text`` embeds 0-5 geo mentions drawn from a fixed grammar the geocode
stage understands:

- point coords:   ``near {lat:.4f}, {lon:.4f}``
- gazetteer name: ``visit {Name}``  (200-entry name→(lon,lat) table)
- bbox polygon:   ``area bbox[{w:.4f},{s:.4f},{e:.4f},{n:.4f}]``
- route line:     ``route {NameA} to {NameB}``

Coordinates cluster around gazetteer cities with a heavily skewed city
popularity (power-law) so low-zoom tiles are genuinely hot — the skew the
north rule requires us to handle, present in the test data by design.

Generation is distributed: ``spark.range(n)`` + one Arrow-batched pandas
UDF; no driver-side materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# splitmix64 — deterministic per-index randomness, vectorized
# ---------------------------------------------------------------------------

def _splitmix64(v: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = np.asarray(v, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _rand_u64(i: np.ndarray, salt: int) -> np.ndarray:
    return _splitmix64(np.asarray(i, dtype=np.uint64) ^ np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))


def _rand_unit(i: np.ndarray, salt: int) -> np.ndarray:
    return (_rand_u64(i, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# Gazetteer: 200 deterministic city names → (lon, lat)
# ---------------------------------------------------------------------------

_SYL = ["ka", "lo", "mi", "ra", "ve", "no", "su", "ti", "ba", "del",
        "for", "gan", "hel", "jun", "por", "quin", "sal", "tor", "ul", "wes"]


def _make_gazetteer(n: int = 200):
    names, lons, lats = [], [], []
    for k in range(n):
        h = int(_splitmix64(np.uint64(k + 1)))
        name = (
            _SYL[h % 20] + _SYL[(h >> 5) % 20] + _SYL[(h >> 10) % 20]
        ).capitalize() + f"{k:03d}"
        lon = ((h >> 16) % 355000) / 1000.0 - 177.5
        lat = ((h >> 24) % 165000) / 1000.0 - 82.5
        names.append(name)
        lons.append(round(lon, 4))
        lats.append(round(lat, 4))
    return names, np.array(lons), np.array(lats)


GAZ_NAMES, GAZ_LONS, GAZ_LATS = _make_gazetteer()
GAZETTEER = {n: (lo, la) for n, lo, la in zip(GAZ_NAMES, GAZ_LONS, GAZ_LATS)}

_NOISE = ["the", "data", "page", "with", "from", "about", "more", "info",
          "news", "report", "update", "local", "world", "best", "guide"]

_LANGS = ["en"] * 19 + ["de"]  # i % 20 == 19 → de; refined below


def _pick_city(i: np.ndarray, salt: int) -> np.ndarray:
    """Power-law city index: city 0 is ~200x hotter than city 199."""
    u = _rand_unit(i, salt)
    return np.minimum((200.0 * u * u * u).astype(np.int64), 199)


def synth_pdf(i: np.ndarray) -> pd.DataFrame:
    """Rows for indices ``i`` (uint64/int64 array) — pure function of i."""
    i = np.asarray(i, dtype=np.int64)
    n = len(i)
    url = pd.array([f"https://site{v % 1000}.example/page{v}" for v in i], dtype="string")
    warc_ts = pd.to_datetime("2020-01-01") + pd.to_timedelta(i * 137, unit="s")
    lang = np.where(i % 20 == 19, "de", np.where(i % 20 == 18, "fr", "en"))

    n_mentions = (_rand_u64(i, 1) % np.uint64(6)).astype(np.int64)  # 0..5
    noise_a = np.array(_NOISE)[(_rand_u64(i, 2) % np.uint64(15)).astype(np.int64)]
    noise_b = np.array(_NOISE)[(_rand_u64(i, 3) % np.uint64(15)).astype(np.int64)]
    text = np.char.add(np.char.add(noise_a, " "), noise_b)

    gaz_names = np.array(GAZ_NAMES)
    for k in range(5):
        has = n_mentions > k
        kind = (_rand_u64(i, 10 + k) % np.uint64(10)).astype(np.int64)
        city = _pick_city(i, 20 + k)
        # jittered point near city (cluster radius ~0.5 deg)
        jlon = np.clip(GAZ_LONS[city] + (_rand_unit(i, 30 + k) - 0.5), -179.9, 179.9)
        jlat = np.clip(GAZ_LATS[city] + (_rand_unit(i, 40 + k) - 0.5), -85.0, 85.0)
        lat_s = np.char.mod("%.4f", np.round(jlat, 4))
        lon_s = np.char.mod("%.4f", np.round(jlon, 4))
        name_a = gaz_names[city]
        name_b = gaz_names[_pick_city(i, 50 + k)]
        w = np.round(np.clip(jlon - _rand_unit(i, 60 + k) * 2.0, -180, 180), 4)
        s = np.round(np.clip(jlat - _rand_unit(i, 70 + k) * 2.0, -85, 85), 4)
        e = np.round(np.clip(w + 0.5 + _rand_unit(i, 80 + k) * 2.0, -180, 180), 4)
        no = np.round(np.clip(s + 0.5 + _rand_unit(i, 90 + k) * 2.0, -85, 85), 4)

        def cat(*parts):
            out = parts[0] if isinstance(parts[0], np.ndarray) else np.full(n, parts[0])
            for p in parts[1:]:
                out = np.char.add(out.astype("<U256"), np.asarray(p).astype("<U64"))
            return out

        pt_m = cat("near ", lat_s, ", ", lon_s)
        gaz_m = cat("visit ", name_a)
        bbox_m = cat(
            "area bbox[", np.char.mod("%.4f", w), ",", np.char.mod("%.4f", s),
            ",", np.char.mod("%.4f", e), ",", np.char.mod("%.4f", no), "]",
        )
        route_m = cat("route ", name_a, " to ", name_b)
        mention = np.select(
            [kind < 5, kind < 8, kind == 8, kind == 9],
            [pt_m, gaz_m, bbox_m, route_m],
        ).astype("<U400")
        noise_k = np.array(_NOISE)[(_rand_u64(i, 100 + k) % np.uint64(15)).astype(np.int64)]
        seg = cat(" ", mention, " ", noise_k)
        text = np.char.add(
            text.astype("<U4096"), np.where(has, seg, "").astype("<U512")
        )
    text = pd.Series(text).str.replace(r"\s+", " ", regex=True).str.strip()
    html = ("<html><body>" + text + "</body></html>").map(lambda s: s.encode("utf-8"))
    return pd.DataFrame(
        {
            "url": url.astype(object),
            "warc_ts": warc_ts,
            "html": html,
            "text": text.astype(object),
            "lang": pd.array(lang, dtype=object),
        }
    )


WEBPAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def webpages(spark: SparkSession, n: int = 1000, partitions: int = 32) -> DataFrame:
    """Distributed deterministic corpus of ``n`` pages."""

    def gen(batches):
        for pdf in batches:
            yield synth_pdf(pdf["id"].to_numpy())

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=WEBPAGES_SCHEMA)
    )
