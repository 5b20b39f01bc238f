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
               SPARK_GRAFT_CPUS=str(cores))
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    cmd = [submit,
           "--master", f"local[{cores}]",
           "--driver-memory", os.environ.get("FRONTIER_DRIVER_MEM", "48g"),
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pyfiles = build_zip("/tmp/frontier.zip")

    results = {}
    for cores in (8, 32):
        results[cores] = run_bench(cores, sf_dir, pyfiles)
        print(f"local[{cores}]: {json.dumps(results[cores])}", flush=True)

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
