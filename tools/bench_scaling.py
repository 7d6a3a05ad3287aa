"""Scaling-efficiency harness (BASELINE.md sandbox proxy for the north
rule's N → 4N executor criterion): run bench.py at local[8] and
local[32] on the same input in fresh JVMs, report throughput at both and
efficiency = (tput32 / tput8) / 4. Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, queries: str | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    if queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = queries
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    r8 = run(8, sf_dir, queries)
    r32 = run(32, sf_dir, queries)
    eff = (r32["value"] / r8["value"]) / 4.0 if r8["value"] else 0.0
    report = {
        "sf_dir": sf_dir,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8 per BASELINE.json (sandbox proxy local[8]→local[32])",
    }
    print(json.dumps(report, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("# BENCH/BASELINE — measured throughput & scaling\n\n")
        f.write(
            "Sandbox proxy for the north rule's N→4N executor criterion "
            "(no real cluster available): identical job + input at two "
            "parallelism levels, fresh JVM each.\n\n"
        )
        f.write(f"- input: `{sf_dir}` ({r8['input_rows']} lineitem rows)\n")
        f.write(
            f"- flagship (spatial-join + tile-assignment) rows/sec: "
            f"**{r8['value']:.0f}** @ local[8] → **{r32['value']:.0f}** @ local[32]\n"
        )
        f.write(f"- scaling efficiency (tput32/tput8)/4: **{eff:.3f}** (target ≥ 0.8)\n\n")
        f.write("Per-query wall seconds:\n\n")
        f.write("| query | local[8] | local[32] | speedup |\n|---|---|---|---|\n")
        for q in r8["queries"]:
            s8 = r8["queries"][q]
            s32 = r32["queries"].get(q, float("nan"))
            sp = s8 / s32 if s32 else float("nan")
            f.write(f"| {q} | {s8:.2f}s | {s32:.2f}s | {sp:.2f}× |\n")
        f.write(
            "\nNotes: wall times include per-query Spark job submission "
            "overhead; the flagship metric divides input rows by the "
            "flagship query's wall time. Skew stats and partition counts: "
            "see bench.py (AQE on, shuffle partitions = cpu count).\n"
        )


if __name__ == "__main__":
    main()
