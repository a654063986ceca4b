"""Byte-parity manifest: whole-tileset builds reconstructed from the
reference Makefile's flag-encoded golden filenames must match the
committed goldens with PLAIN STRING EQUALITY (the reference's own cmp).

The manifest below is every golden scripts/golden_sweep.py currently
reproduces byte-for-byte — each line is a complete build (source parse →
planner → fused pyramid → reference-exact metadata → decode rendering).
Run `python3 scripts/golden_sweep.py` to survey the remaining gap.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

MANIFEST = [
    "high-longitude/out/-z1.json",
    "id/out/-Z11.json",
    "intersection/out/-Z11_-z11_--extra-detail_13_--no-simplification-of-shared-nodes.json",
    "longattr/out/-z0.json",
    "longjson/out/-z0.json",
    "minzoom-variable-depth/out/-Z10_-z11_--generate-variable-depth-tile-pyramid.json",
    "minzoom/out/-z6.json",
    "multilinestring/out/-z1.json",
    "muni/out/-Z11_-z11.json",
    "ne_110m_admin_1_states_provinces_lines/out/-X_-z4.json",
    "ne_110m_admin_1_states_provinces_lines/out/-z5_-ymapcolor13_-ymapcolor9_-pSi_-d8_-D16.json",
    "ne_110m_populated_places-minzoom/out/-yNAME_-ySCALERANK_-z5.json",
    "ne_110m_populated_places/out/--smallest-maximum-zoom-guess_3_-Bg.json",
    "ne_110m_populated_places/out/-z0_--clip-bounding-box_-110,27,-92,52.json",
    "ne_110m_populated_places/out/-z0_--order-by_LATITUDE.json",
    "ne_110m_populated_places/out/-z0_-r1_-yNAME_-ySOV0NAME_-yELEVATION_-YNAME%3aCity_-YSOV0NAME%3aCountry.json",
    "nested/out/-z0_--preserve-input-order.json",
    "onefeature-point/out/--smallest-maximum-zoom-guess_3.json",
    "overture-235/out/-z0.json",
    "stringid/out/-z0.json",
    "stringid/out/-z0_--use-attribute-for-id_special.json",
    "stringid/out/-z0_--use-attribute-for-id_special_-X.json",
    "stringid/out/-z0_--use-attribute-for-id_special_-xspecial.json",
    "stringid/out/-z0_--use-attribute-for-id_special_-yother.json",
    "tl_2018_51685_roads/out/-Z11_-z11_--no-simplification-of-shared-nodes.json",
]

REF = "/root/reference/tests"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference unavailable")
def test_golden_byte_manifest(spark):
    import golden_sweep

    failures = []
    for rel in MANIFEST:
        path = f"{REF}/{rel}"
        if not os.path.exists(path):
            continue
        res = golden_sweep.run_one(spark, path)
        if res != "BYTE_OK":
            failures.append((rel, res))
    assert not failures, failures
