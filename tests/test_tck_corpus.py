"""openCypher TCK corpus regression (reference: the 220-feature corpus at
engine/src/test/resources/opencypher/tck/features, runner
OpenCypherTCKSuite.java).

Runs whole feature areas through tests/tck_runner.py and asserts the
pass count stays at or above the pinned floor — a cheap tripwire that
Cypher semantics don't regress.  Floors are set below current levels so
environmental flakiness doesn't produce false alarms; raise them as
coverage grows.  The full-corpus tally lives in NOTES.md; use
``python tools/run_tck.py`` for a complete run."""

from __future__ import annotations

import glob
import os

import pytest

pytestmark = pytest.mark.slow

from tck_runner import TCK_ROOT, parse_feature, run_scenario


def _run_area(spark, area: str) -> tuple[int, int, int]:
    n_pass = n_fail = n_skip = 0
    files = sorted(
        glob.glob(os.path.join(TCK_ROOT, area, "**", "*.feature"),
                  recursive=True)
    )
    assert files, f"no TCK features under {area}"
    for path in files:
        for sc in parse_feature(path):
            runnable = sc.expect_error or (sc.query and sc.expect is not None)
            if sc.skip or not runnable:
                n_skip += 1
                continue
            try:
                ok, detail = run_scenario(spark, sc)
            except Exception:  # noqa: BLE001 — tally, don't abort the area
                ok, detail = False, "crash"
            if ok:
                n_pass += 1
            elif detail.startswith("SKIP"):
                n_skip += 1
            else:
                n_fail += 1
    return n_pass, n_fail, n_skip


@pytest.mark.parametrize(
    ("area", "floor"),
    [
        ("expressions/quantifier", 430),
        ("clauses/return", 35),
        # clauses/with has 29 scenarios total (the old floor of 45 was
        # calibrated against a prefix-matched tally that also counted
        # with-orderBy/with-where/with-skip-limit); 28 pass, 1 skip
        ("clauses/with", 28),
        ("expressions/boolean", 18),
        ("expressions/null", 20),
        # round-4 conformance floors (areas at or near 100%)
        ("clauses/match", 378),
        # round-5 floors: CALL (incl. error-class assertions), VARIANT-
        # backed heterogeneous collections, strict error taxonomy
        ("clauses/call", 52),
        ("expressions/list", 183),
        ("expressions/literals", 129),
        ("expressions/map", 44),
        ("expressions/comparison", 72),
        ("expressions/typeConversion", 47),
        ("clauses/merge", 75),
        ("clauses/with-orderBy", 292),
        ("expressions/pattern", 50),
        ("expressions/path", 7),
        ("useCases", 30),
        # round-5: ±1e9-year BigDate kernel + merged-tzdb zone resolution
        # took expressions/temporal to 1004/1004 (was 1001)
        ("expressions/temporal", 1004),
    ],
)
def test_tck_area_floor(spark, area, floor):
    n_pass, n_fail, n_skip = _run_area(spark, area)
    assert n_pass >= floor, (
        f"{area}: {n_pass} pass / {n_fail} fail / {n_skip} skip — "
        f"regressed below the {floor} floor"
    )
