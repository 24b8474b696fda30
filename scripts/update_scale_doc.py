"""Render the binding scale run's receipts from its run-dir manifest.

Usage: python scripts/update_scale_doc.py /tmp/ecoli_r4

Prints a markdown per-stage wall-clock table (for docs/scale_run.md) and,
if <run-dir>/scale_metrics.json exists, copies it to the repo root.
"""

import json
import os
import shutil
import sys


def main(run_dir):
    man = json.load(open(os.path.join(run_dir, "manifest.json")))
    stages = man.get("stages", {})
    rows = sorted(stages.items(), key=lambda kv: -kv[1].get("elapsed_s", 0))
    total = sum(v.get("elapsed_s", 0.0) for v in stages.values())
    print("| stage | wall (s) | key metrics |")
    print("|---|---|---|")
    for name, rec in rows:
        m = rec.get("metrics", {})
        keys = [f"{k}={v}" for k, v in list(m.items())[:4]
                if not isinstance(v, (dict, list))]
        print(f"| {name} | {rec.get('elapsed_s', 0):.1f} | "
              f"{', '.join(keys)} |")
    print(f"| **total ({len(rows)} stages)** | **{total:.1f}** | |")
    sm = os.path.join(run_dir, "scale_metrics.json")
    if os.path.exists(sm):
        dst = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scale_metrics.json")
        shutil.copy(sm, dst)
        print(f"\ncopied {sm} -> {dst}", file=sys.stderr)
    else:
        print("\n(scale_metrics.json not present yet — run incomplete)",
              file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1])
