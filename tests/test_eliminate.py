"""Iterative Eliminate (EliminateOperation.java:82 convergence semantics).

The single pass was round 2's building block; round 3 adds the fixpoint
loop. The chain fixture proves iteration is REQUIRED: sliver C only becomes
absorbable after the keeper has grown by absorbing sliver B.
"""

from __future__ import annotations

import pytest

from opengxt_spark import overlay


@pytest.fixture(scope="module")
def chain(spark):
    # A: keeper 20x20 at origin. B: sliver touching A (right edge).
    # C: sliver touching B only (B's right edge) — NOT A.
    # D: isolated sliver far away (no keeper will ever reach it).
    rows = [
        (1, 0.0, 0.0, 10.0, 10.0),   # area 400 >= 250 -> keeper
        (2, 12.0, 0.0, 3.0, 3.0),    # area 36 -> sliver; |dx|=12 <= 13
        (3, 18.0, 0.0, 3.0, 3.0),    # |dx to A|=18 > 13; |dx to B|=6 <= 6
        (4, 500.0, 500.0, 2.0, 2.0), # isolated sliver
    ]
    return spark.createDataFrame(
        rows, "rid bigint, cx double, cy double, hw double, hh double"
    )


def test_single_pass_misses_chained_sliver(spark, chain):
    once = overlay.eliminate_pass(chain, 250.0, cell_size=20.0)
    got = {r["rid"]: r for r in once.collect()}
    # B absorbed into A; C and D survive pass 1
    assert set(got) == {1, 3, 4}
    assert got[1]["hw"] == 12.5  # A extent now [-10, 15] -> hw 12.5


def test_converged_absorbs_chain_and_reaches_fixpoint(spark, chain):
    done = overlay.eliminate_converged(chain, 250.0, cell_size=20.0)
    got = {r["rid"]: r for r in done.collect()}
    # pass 2 absorbs C into the grown A; D stays (no reachable keeper)
    assert set(got) == {1, 4}
    assert got[1]["hw"] == 15.5  # [-10, 21] after absorbing C
    # fixpoint: one more pass changes nothing
    again = {
        (r["rid"], r["cx"], r["cy"], r["hw"], r["hh"])
        for r in overlay.eliminate_pass(done, 250.0, cell_size=20.0).collect()
    }
    before = {
        (r["rid"], r["cx"], r["cy"], r["hw"], r["hh"]) for r in done.collect()
    }
    assert again == before
    # zero remaining ABSORBABLE slivers: every surviving sliver has no
    # intersecting keeper
    sl = [r for r in done.collect() if 4.0 * r["hw"] * r["hh"] < 250.0]
    kp = [r for r in done.collect() if 4.0 * r["hw"] * r["hh"] >= 250.0]
    for s in sl:
        for k in kp:
            assert not (
                abs(s["cx"] - k["cx"]) <= s["hw"] + k["hw"]
                and abs(s["cy"] - k["cy"]) <= s["hh"] + k["hh"]
            )


def test_all_keepers_is_identity(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0), (2, 30.0, 0.0, 10.0, 10.0)],
        "rid bigint, cx double, cy double, hw double, hh double",
    )
    out = overlay.eliminate_converged(df, 250.0, cell_size=20.0)
    got = {(r["rid"], r["cx"], r["hw"]) for r in out.collect()}
    assert got == {(1, 0.0, 10.0), (2, 30.0, 10.0)}
