"""Statistics planner (-zg / basezoom / droprate) vs a direct
transcription of the reference algorithm (main.cpp:2279-2670) run over
the same collected indices."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tippecanoe_spark.config import TilingConfig
from tippecanoe_spark.plan import (
    MAX_FEATURES,
    MAX_ZOOM,
    gap_stats,
    guess_basezoom_droprate,
    guess_maxzoom_from_stats,
    max_tile_counts,
    resolve_plan,
    round_droprate,
)


def _reference_maxzoom_sim(ix_sorted, full_detail=12, droprate=-3.0):
    """Line-by-line transcription of the -zg Welford loop and maxzoom
    formula (main.cpp:2286-2434), gamma/cluster/dist paths excluded."""
    mean = 0.0
    count = 0
    m2 = 0.0
    dupes = 0
    for ip in range(1, len(ix_sorted)):
        d = ix_sorted[ip] - ix_sorted[ip - 1]
        if d != 0:
            newValue = math.log(d)
            count += 1
            delta = newValue - mean
            mean += delta / count
            delta2 = newValue - mean
            m2 += delta * delta2
        else:
            dupes += 1
    assert count > 0
    stddev = math.sqrt(m2 / count)
    nearby = math.exp(mean - 1.5 * stddev)
    nearby_ft = math.sqrt(nearby) / 33
    want = nearby_ft / 2
    maxzoom = math.ceil(
        math.log(360 / (0.00000274 * want)) / math.log(2) - full_detail
    )
    maxzoom = max(maxzoom, 0)
    rate = droprate
    if droprate == -3.0:
        rate = round_droprate(math.exp(-0.7681 * math.log(stddev) + 1.582))
        rate = max(rate, 0)
        if dupes != 0 and rate != 0:
            maxzoom += round(math.log((dupes + count) / count) / math.log(rate))
    maxzoom = max(maxzoom, 0)
    maxzoom = min(maxzoom, 32 - full_detail, 33 - full_detail + 1)
    return maxzoom, rate


def _reference_basezoom_sim(xy, maxzoom, basezoom=-1, droprate=-1.0):
    """Transcription of the per-zoom max-count scan + basezoom/droprate
    selection (main.cpp:2490-2634), gamma=0."""
    from collections import Counter

    maxes = {}
    for z in range(MAX_ZOOM + 1):
        c = Counter((x >> (32 - z), y >> (32 - z)) if z else (0, 0) for x, y in xy)
        maxes[z] = max(c.values())
    if basezoom < 0:
        basezoom = MAX_ZOOM
        for z in range(MAX_ZOOM, -1, -1):
            if maxes[z] < MAX_FEATURES:
                basezoom = z
    if basezoom > maxzoom:
        if droprate < 0:
            droprate = round_droprate(
                math.exp(math.log(maxes[0] / maxes[maxzoom]) / maxzoom)
            )
        basezoom = 0
        for z in range(0, maxzoom + 1):
            zoomdiff = math.log(maxes[z] / MAX_FEATURES) / math.log(droprate)
            if zoomdiff + z > basezoom:
                basezoom = math.ceil(zoomdiff + z)
    elif droprate < 0:
        droprate = 1.0
        for z in range(basezoom - 1, -1, -1):
            interval = math.exp(math.log(droprate) * (basezoom - z))
            if maxes[z] / interval >= MAX_FEATURES:
                interval = maxes[z] / MAX_FEATURES
                droprate = round_droprate(
                    math.exp(math.log(interval) / (basezoom - z))
                )
    return maxes, basezoom, droprate


@pytest.fixture(scope="module")
def doc_feats(spark):
    from tippecanoe_spark.features import serialize
    from tippecanoe_spark.flagship import doc_point_features

    cfg = TilingConfig()
    return serialize(
        doc_point_features(spark, "/root/testdata/sf0.001"), cfg
    ).persist()


class TestMaxzoomGuess:
    def test_matches_reference_simulation(self, doc_feats):
        cfg = TilingConfig(maxzoom=-1, droprate=-3.0)
        ix = np.sort(
            np.array([r["index"] for r in doc_feats.select("index").collect()])
        )
        ref_mz, ref_rate = _reference_maxzoom_sim(ix, cfg.full_detail, -3.0)
        stats = gap_stats(doc_feats)
        got_mz, got_rate = guess_maxzoom_from_stats(stats, cfg)
        assert got_mz == ref_mz
        assert got_rate == pytest.approx(ref_rate, abs=1e-9)

    def test_gap_stats_exact_vs_numpy(self, doc_feats):
        ix = np.sort(
            np.array([r["index"] for r in doc_feats.select("index").collect()])
        )
        d = np.diff(ix)
        logs = np.log(d[d > 0].astype(np.float64))
        stats = gap_stats(doc_feats)
        assert stats["count"] == len(logs)
        assert stats["dupes"] == int((d == 0).sum())
        assert stats["mean"] == pytest.approx(float(logs.mean()), rel=1e-12)
        assert stats["m2"] == pytest.approx(
            float(((logs - logs.mean()) ** 2).sum()), rel=1e-9
        )


class TestBasezoomGuess:
    def test_max_counts_match_reference_scan(self, doc_feats):
        rows = doc_feats.select("minx", "maxx", "miny", "maxy").collect()
        xy = [
            ((r["minx"] + r["maxx"]) // 2, (r["miny"] + r["maxy"]) // 2)
            for r in rows
        ]
        ref_maxes, ref_bz, ref_rate = _reference_basezoom_sim(
            xy, maxzoom=14, basezoom=-1, droprate=-1.0
        )
        got_maxes = max_tile_counts(doc_feats)
        assert got_maxes == ref_maxes
        got_bz, got_rate = guess_basezoom_droprate(
            got_maxes, TilingConfig(basezoom=-1, droprate=-1.0), 14
        )
        assert got_bz == ref_bz
        assert got_rate == pytest.approx(ref_rate, abs=1e-9)


class TestResolvePlan:
    def test_fills_all_unset_knobs(self, doc_feats):
        cfg = TilingConfig(maxzoom=-1, basezoom=-2, droprate=-3.0)
        out = resolve_plan(doc_feats, cfg)
        assert out.maxzoom >= 0
        assert out.basezoom >= 0
        assert out.droprate > 0
        assert out.maxzoom <= 32 - cfg.full_detail

    def test_explicit_knobs_untouched(self, doc_feats):
        cfg = TilingConfig(maxzoom=6, basezoom=4, droprate=2.5)
        out = resolve_plan(doc_feats, cfg)
        assert (out.maxzoom, out.basezoom, out.droprate) == (6, 4, 2.5)
