#!/usr/bin/env python
"""Pre-snapshot gate (VERDICT r5 item 8): run before ANY end-of-round or
milestone commit.  Round 5 ended red because its final commit shipped a
behavior change without re-running the suite; this tool makes the check
one command and one exit code.

Runs, in order, failing fast:

1. the full pytest suite in two halves (the same split the judge uses —
   one long pytest run in this container can exceed a single command
   timeout, so the gate mirrors the split instead of hoping);
2. the rounding-boundary audit at sf0.01 (tools/boundary_audit.py, new
   in r9 — catches the CORRECTNESS_r08 failure class the parity sweep
   structurally cannot: graded values whose cross-engine stability
   depends on the driver's engine builds, not on local agreement);
3. the driver-shaped oracle-parity sweep at sf0.01 (the correctness
   gate's local replica);
4. a bench.py smoke at sf0.001 (must print one JSON line — catches a
   broken headline entry without paying the sf0.1 wall time).

Usage: python tools/preflight.py [--fast]
  --fast skips the parity sweep and bench smoke (suite only).
Exit code 0 = safe to commit a snapshot.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# split roughly evenly by wall time (streaming/e2e files dominate)
HALF_A = ["tests/test_streaming.py", "tests/test_end_to_end.py",
          "tests/test_manifest.py", "tests/test_query_store.py",
          "tests/test_oracle_parity.py"]


def run(cmd: list[str], env: dict | None = None,
        drop: tuple[str, ...] = ()) -> int:
    print(f"\n=== {' '.join(cmd)}", flush=True)
    t0 = time.time()
    e = dict(os.environ)
    for k in drop:
        e.pop(k, None)
    if env:
        e.update(env)
    rc = subprocess.call(cmd, cwd=REPO, env=e)
    print(f"=== rc={rc} ({time.time() - t0:.0f}s)", flush=True)
    return rc


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    py = sys.executable

    # the suite halves must NOT inherit SPARK_GRAFT_SF1 — with it set,
    # half B un-skips the FULL 12-entry sf1 gate (~54 min) instead of
    # the smoke subset the dedicated step below runs (r15: the first
    # wiring attempt timed a preflight out exactly this way)
    half_b = ["--ignore=" + p for p in HALF_A]
    if run([py, "-m", "pytest", "-q", *HALF_A], drop=("SPARK_GRAFT_SF1",)):
        print("PREFLIGHT FAIL: suite half A red")
        return 1
    if run([py, "-m", "pytest", "-q", "tests/", *half_b],
           drop=("SPARK_GRAFT_SF1",)):
        print("PREFLIGHT FAIL: suite half B red")
        return 1

    # opt-in sf1 smoke (VERDICT r14 item 5): when the caller exports
    # SPARK_GRAFT_SF1=1 and the derived tables exist, run the five
    # entries whose scale thresholds bind first (~7 min) — the full
    # 12-entry sf1 gate stays a round-boundary ritual, this keeps a
    # scale-exactness canary inside the pre-commit loop.
    if os.environ.get("SPARK_GRAFT_SF1"):
        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR",
                                 str(REPO / "bench_data" / "sf1"))
        if os.path.isdir(sf1_dir):
            if run([py, "-m", "pytest", "-q", "-m", "sf1smoke",
                    "tests/test_sf1_exactness.py"]):
                print("PREFLIGHT FAIL: sf1 smoke red (a scale "
                      "threshold crossed — see tests/test_sf1_exactness.py)")
                return 1
        else:
            print(f"sf1 smoke skipped: {sf1_dir} missing "
                  "(tools/make_scaled_sf.py builds it)")

    if not fast:
        if run([py, "tools/boundary_audit.py"]):
            print("PREFLIGHT FAIL: rounding-boundary audit red (a graded "
                  "double is inside the cross-engine fragile band, or a "
                  "graded oracle interpolates percentiles — the r8 driver "
                  "failure class)")
            return 1
        if run([py, "-m", "pytest", "-q", "tests/test_oracle_parity.py"],
               env={"SPARK_GRAFT_PARITY_SF": "/root/testdata/sf0.01"}):
            print("PREFLIGHT FAIL: oracle parity sweep red")
            return 1
        out = subprocess.run(
            [py, "bench.py"], cwd=REPO, capture_output=True, text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
                 "SPARK_GRAFT_BENCH_REPS": "1"})
        line = (out.stdout.strip().splitlines() or [""])[-1]
        try:
            rec = json.loads(line)
            assert "value" in rec and "queries" in rec
        except Exception:
            print("PREFLIGHT FAIL: bench.py did not print a JSON line")
            print(out.stdout[-2000:], out.stderr[-2000:])
            return 1
        print(f"bench smoke: {rec['value']}s at sf0.001")

    print("\nPREFLIGHT PASS — safe to snapshot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
