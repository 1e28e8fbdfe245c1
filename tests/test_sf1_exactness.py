"""Opt-in sf1 scale-exactness gate (VERDICT r13 item 5).

The driver correctness gate runs at sf0.01; thresholds baked into the
graded queries (near_dup_pairs' 10k bucket cap, dedup_eval's max_df
posting guard, domain_cap's slack window, the sampling budgets, ...)
could cross at 100× and change results in ways the small-SF gates never
see.  The r12/r13 rounds proved the whole window exact at the derived
sf1 by hand (tools/sf1_exactness.py → SCALING.md); this module makes the
12 threshold-bearing entries a repeatable suite member so a
scale-exactness regression surfaces without the manual round ritual.

Env-gated like the full-size parity sweep — a plain `pytest tests/` run
skips it (the derived sf1 tables are a 2 GiB build artifact, not repo
state).  Recommended invocation (measured r14: 12/12 exact in 54 min on
a moderately-loaded 32-cpu box — winnow_fps' 5.8M-row diff dominates at
~16 min; drop it from THRESHOLD_BEARING locally for a fast pre-commit
loop):

    python tools/make_scaled_sf.py         # once: builds bench_data/sf1
    SPARK_GRAFT_SF1=1 SPARK_GRAFT_TEST_CPUS=32 \
        SPARK_GRAFT_TEST_SHUFFLE=32 SPARK_GRAFT_DRIVER_MEM=48g \
        python -m pytest tests/test_sf1_exactness.py -q

The compare is the in-engine parquet + EXCEPT-ALL bag-equality from
tools/sf1_exactness.check_entry — NOT collect-to-driver (the r13 lesson:
one 6M-row collect compare burned 44 CPU-minutes; the in-engine diff is
seconds).
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR",
                         str(REPO / "bench_data" / "sf1"))

pytestmark = [
    pytest.mark.sf1,
    pytest.mark.skipif(
        not os.environ.get("SPARK_GRAFT_SF1"),
        reason="sf1 exactness gate is opt-in: set SPARK_GRAFT_SF1=1 "
               "(and build bench_data/sf1 via tools/make_scaled_sf.py)"),
]

from tools.sf1_exactness import TABLES, THRESHOLD_BEARING, check_entry

# The pre-commit-sized subset (VERDICT r14 item 5): the entries whose
# thresholds actually BIND first at scale — near_dup_pairs (10k bucket
# cap), dedup_eval (max_df posting guard), domain_cap (slack window),
# and the two samplers (budget draws) — measured 3 m 15 s together at
# r15 (quiet 32-cpu box, 5/5 exact) vs ~54 min for the full set
# (winnow_fps alone ~16 min).  Run as:
#     SPARK_GRAFT_SF1=1 python -m pytest -m sf1smoke tests/ -q
# tools/preflight.py picks this subset up automatically when
# SPARK_GRAFT_SF1 is set; the full 12-entry gate stays the round-
# boundary ritual.
SF1_SMOKE = {"near_dup_pairs", "dedup_eval", "domain_cap",
             "unimax_sample", "temperature_sample"}


@pytest.fixture(scope="module")
def sf1_env(spark):
    if not os.path.isdir(SF1_DIR):
        pytest.skip(f"derived sf1 tables missing at {SF1_DIR} — run "
                    "tools/make_scaled_sf.py first")
    import duckdb

    import __spark_entry__ as ent

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF1_DIR}/{t}.parquet')")
    yield spark, con, ent.queries(), ent.oracle_sql()
    con.close()


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.sf1smoke) if n in SF1_SMOKE
     else pytest.param(n) for n in THRESHOLD_BEARING])
def test_sf1_exact(sf1_env, name, tmp_path):
    spark, con, q, o = sf1_env
    ok, n_spark, n_oracle, n_diff, t_s, t_d = check_entry(
        spark, con, q, o, name, SF1_DIR, tmp=str(tmp_path / "out"))
    assert ok, (f"{name} diverged at sf1: rows={n_spark}/{n_oracle} "
                f"diff={n_diff} (spark={t_s:.1f}s duck={t_d:.1f}s)")
