"""Time every catalog query at one scale factor; compare two sweeps.

The round-9 scaling triage that found three real structural fixes
(orders_negative_sampling, customers_cogroup_recon,
customer_fuzzy_match) in one pass, promoted to a tool.  Method: sweep
the catalog at two scale factors whose data sizes differ by a known
factor K (sf0.1 vs sf1.0 -> K=10), then flag

- ratio >> K  => superlinear: a shuffle/candidate structure that grows
  faster than the data (unless the OUTPUT itself is quadratic by
  design, e.g. customers_geo_proximity's within-radius pairs);
- heavy rows with ratio ~ 1  => scale-flat: a fixed cost dominates —
  usually serialized per-key Python or a single-task stage that AQE's
  byte-based coalescing created (it cannot see per-key Python cost or
  expansion factors), or a single small parquet split feeding a heavy
  per-row stage.

Streaming queries are trigger-bound (ratio ~ 1 is expected); the
host's CPU is burst-throttled minute to minute, so confirm any flagged
row IDLE with anchor brackets (playbook protocol) before digging.

Usage:

    python tools/sweep_catalog.py run <sf_dir> <out.json> [name ...]
    python tools/sweep_catalog.py compare <small.json> <big.json> [K]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run(sf_dir: str, out_path: str, names: list[str]) -> int:
    from data_integration_project_spark import plans
    from data_integration_project_spark.session import get_spark

    spark = get_spark("sweep_catalog")
    out: dict[str, object] = {}
    for name in names or list(plans.REGISTRY):
        try:
            t0 = time.time()
            plans.REGISTRY[name].fn(spark, sf_dir).count()
            out[name] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001 — survey tool, keep sweeping
            out[name] = f"ERR:{type(exc).__name__}"
        print(name, out[name], file=sys.stderr, flush=True)
    json.dump(out, open(out_path, "w"))
    n_err = sum(1 for v in out.values() if isinstance(v, str))
    print(f"# swept {len(out)} at {sf_dir}: {n_err} errors", file=sys.stderr)
    return 1 if n_err else 0


def compare(small_path: str, big_path: str, k: float) -> int:
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    rows = []
    for name, b in big.items():
        s = small.get(name)
        if isinstance(b, str) or isinstance(s, str) or s is None:
            continue
        rows.append((b / max(s, 0.05), b, s, name))
    flagged = 0
    print(f"{'ratio':>7} {'big':>8} {'small':>7}  flag  query")
    for r, b, s, name in sorted(rows, reverse=True):
        flag = ""
        if r > 1.5 * k and b > 2:
            flag, flagged = "SUPERLINEAR", flagged + 1
        elif r < 2 and b > 8:
            flag, flagged = "SCALE-FLAT", flagged + 1
        if flag:
            print(f"{r:7.1f} {b:8.1f} {s:7.2f}  {flag}  {name}")
    print(f"# {flagged} flagged (confirm idle with anchors before digging)")
    return 0


def main(argv: list[str]) -> int:
    if len(argv) >= 4 and argv[1] == "run":
        return run(argv[2], argv[3], argv[4:])
    if len(argv) >= 4 and argv[1] == "compare":
        return compare(argv[2], argv[3], float(argv[4]) if len(argv) > 4 else 10.0)
    print(__doc__, file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
