"""Two-cluster-size scaling evidence (north_rule): run the identical
headline job via spark-submit --py-files at local[8] (N proxy) and
local[32] (4N proxy) on the same input; report throughput at both and
the scaling efficiency T(4N) / (4 × T(N)) into BENCH/BASELINE.md.

Usage: python bench/scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(path: str) -> str:
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "frontier")):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def run_bench(cores: int, sf_dir: str, pyfiles: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cores),
               # scaling evidence needs a compute-bound headline: big
               # enough that the fixed stage-latency floor (~4 s at 32
               # cores across ~15 local-mode stages) is noise against
               # per-core kernel work (~8M pages)
               FRONTIER_BENCH_HEADLINE_ONLY="1",
               FRONTIER_BENCH_AMPLIFY=os.environ.get(
                   "FRONTIER_BENCH_AMPLIFY", "1600"))
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    # pin the process tree to exactly `cores` CPUs: local[8] on a
    # 32-core box otherwise spills Python workers / GC / Arrow IPC
    # threads onto idle cores (~11 cores measured for "8"), which
    # understates true N-core throughput and corrupts the N→4N ratio
    pin = ["taskset", "-c", f"0-{cores - 1}"] \
        if shutil.which("taskset") else []
    cmd = pin + [submit,
                 "--master", f"local[{cores}]",
                 "--driver-memory",
                 os.environ.get("FRONTIER_DRIVER_MEM", "48g"),
                 "--py-files", pyfiles,
                 os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600, check=False)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            return json.loads(line)
    raise RuntimeError(
        f"bench at local[{cores}] produced no JSON:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def _steal_pct() -> float:
    with open("/proc/stat") as fh:
        vals = list(map(int, fh.readline().split()[1:]))
    total = sum(vals)
    return 100.0 * vals[7] / total if total else 0.0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pyfiles = build_zip("/tmp/frontier.zip")

    # Pin all benchmark IO to tmpfs: this VM evicts the page cache
    # between runs, so disk-backed parquet reads add tens of seconds
    # of noise that swamps the N vs 4N comparison. A real cluster
    # bench would read from distributed storage at both sizes equally.
    if os.path.isdir("/dev/shm"):
        shm_sf = os.path.join("/dev/shm/frontier_bench",
                              os.path.basename(sf_dir.rstrip("/")))
        if not os.path.isdir(shm_sf):
            os.makedirs(shm_sf, exist_ok=True)
            for fn in os.listdir(sf_dir):
                shutil.copy2(os.path.join(sf_dir, fn),
                             os.path.join(shm_sf, fn))
        sf_dir = shm_sf
        os.environ.setdefault(
            "FRONTIER_BENCH_PAGES",
            f"/dev/shm/frontier_bench/pages_x"
            f"{os.environ.get('FRONTIER_BENCH_AMPLIFY', '1600')}")
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

    # interleave A/B/A/B and keep the per-config minimum: this VM's
    # effective CPU drifts minute-to-minute (host contention), so
    # back-to-back single runs systematically bias one config
    results: dict[int, dict] = {}
    steals: dict[int, list] = {8: [], 32: []}
    for _round in range(2):
        for cores in (8, 32):
            s0 = _steal_pct()
            out = run_bench(cores, sf_dir, pyfiles)
            steals[cores].append(round(_steal_pct() - s0, 2))
            prev = results.get(cores)
            if prev is None or out["queries"]["frontier_schedule_parse"] \
                    < prev["queries"]["frontier_schedule_parse"]:
                results[cores] = out
            print(f"round {_round} local[{cores}]: "
                  f"{json.dumps(out['queries'])}", flush=True)

    t8 = results[8]["queries"]["frontier_schedule_parse"]
    t32 = results[32]["queries"]["frontier_schedule_parse"]
    thr8 = results[8]["n_pages"] / t8
    thr32 = results[32]["n_pages"] / t32
    eff = thr32 / (4 * thr8)

    md = f"""# BENCH — measured baseline (this engine)

Same job, same input, two parallelism levels (no multi-node cluster in
this sandbox; 32 cores present). Headline = synth pages → MHTML parse +
byte-faithful main-text extraction → canonicalize → robots gate →
per-host politeness budget → fetch-ordered count, via
`spark-submit --py-files frontier.zip bench.py`.

Input: `{sf_dir}` documents ×{results[8].get('n_pages')} pages.

| parallelism | wall sec (headline) | URLs scheduled+parsed/sec |
|---|---|---|
| local[8]  (N proxy)  | {t8:.2f} | {thr8:,.0f} |
| local[32] (4N proxy) | {t32:.2f} | {thr32:,.0f} |

**Scaling efficiency N→4N = T(32c)/(4·T(8c)) = {eff:.3f}**
(target ≥ 0.8, BASELINE.json)

Full per-operator timings (seconds):

| query | local[8] | local[32] |
|---|---|---|
"""
    for name in results[8]["queries"]:
        md += (f"| {name} | {results[8]['queries'][name]} "
               f"| {results[32]['queries'].get(name, '')} |\n")
    md += f"""
Raw JSON:

```json
{json.dumps(results[8])}
{json.dumps(results[32])}
```
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(md)
    print(f"wrote {out_path}; efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
