"""North-rule scaling evidence: frontier throughput at N vs 4N cores.

The BASELINE.json metric demands throughput scaling efficiency >= 0.8
from N to 4N executors.  This sandbox has no multi-executor cluster, so
(per the driver instruction) the same job runs at two parallelism
levels — ``local[8]`` and ``local[32]`` — on identical input, in
separate JVMs, and efficiency is

    eff = (urls_per_sec[32] / urls_per_sec[8]) / 4

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/bench_scaling.py [n_urls]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_frontier(cpus: int, n_urls: int) -> dict:
    env = os.environ.copy()
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY_FRONTIER="1",
        BENCH_FRONTIER_URLS=str(n_urls),
        BENCH_REPS=env.get("BENCH_REPS", "2"),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench.py (cpus={cpus}) produced no JSON line")
    return json.loads(lines[-1])


def main() -> None:
    n_urls = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_000_000
    lo_cpus, hi_cpus = 8, 32

    lo = run_frontier(lo_cpus, n_urls)
    hi = run_frontier(hi_cpus, n_urls)
    eff = (hi["frontier_urls_per_sec"] / lo["frontier_urls_per_sec"]) / (hi_cpus / lo_cpus)

    result = {
        "metric": "frontier schedule+dedupe scaling efficiency, local[8] -> local[32]",
        "n_urls": n_urls,
        "urls_per_sec_8": lo["frontier_urls_per_sec"],
        "urls_per_sec_32": hi["frontier_urls_per_sec"],
        "wall_sec_8": lo["frontier_wall_sec"],
        "wall_sec_32": hi["frontier_wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/BASELINE — north-rule scaling evidence

Metric (BASELINE.json): frontier URLs scheduled+deduped per second with
throughput scaling efficiency >= 0.8 from N to 4N executors.  Sandbox
stand-in (per driver instruction): the same job — synthetic skewed
frontier (90% of URLs on one apple.com-style host), sharded-Bloom-gated
exact anti-join dedupe, per-host politeness budget gate — on identical
input at two parallelism levels, separate JVMs.

| config | URLs | wall (s) | URLs/s |
|---|---|---|---|
| `local[{lo_cpus}]`  (N)  | {n_urls:,} | {lo['frontier_wall_sec']} | {lo['frontier_urls_per_sec']:,} |
| `local[{hi_cpus}]` (4N) | {n_urls:,} | {hi['frontier_wall_sec']} | {hi['frontier_urls_per_sec']:,} |

**Scaling efficiency (N -> 4N): {result['scaling_efficiency']}**
(target >= 0.8: {"PASS" if result['pass'] else "FAIL"})

Methodology notes

- Input is generated executor-side with ``spark.range`` (no driver
  materialization), so the identical code path scales to the 10^10-URL
  target; seen set = 50% of the corpus; per-host budget gates the
  skewed host.
- Each JVM warms up first (Python worker fork + JIT + first-touch
  pages) and the timed figure is best-of-{os.environ.get("BENCH_REPS", "2")}
  — steady-state throughput, matching the long-lived-cluster semantics
  of the north rule.  Shuffle partitions = 2x cores in both configs.
- Reproduce: ``python scripts/bench_scaling.py {n_urls}``.
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
