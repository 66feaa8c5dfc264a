"""Regenerate plans/driver_sampled.py from the driver's CORRECTNESS files.

The driver samples a ~50-query prefix of ``queries()`` each round and
records per-query verdicts in ``CORRECTNESS_r{N}.json``. To maximize
cumulative driver-side evidence, the catalog leads with queries the
driver has NEVER sampled (see plans/catalog.py `_ordered_names`). This
tool scans every CORRECTNESS_r*.json in the repo root and freezes the
union of sampled names into an importable module, so the ordering is
deterministic at runtime and the provenance is committed per round.

Run after each round lands a new CORRECTNESS file:

    python tools/gen_driver_sampled.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    ROOT, "data_integration_project_spark", "plans", "driver_sampled.py"
)


def _is_green(result: dict) -> bool:
    """A sampled row is red iff a match flag is explicitly False or the
    driver recorded a real error. Oracle-less queries get the weaker
    rows-only check: the driver writes ``err: "no_oracle"`` with every
    ``*_match`` flag null (e.g. monitoring_file_stats in r01) — that is
    a PASS of the weaker check, not a red; treating it as red would pin
    such a query to the catalog head forever (it can never turn
    hash-green)."""
    err = result.get("err")
    if err and err != "no_oracle":
        return False
    return not any(
        v is False for k, v in result.items() if k.endswith("_match")
    )


def _round_key(path: str) -> int:
    """Numeric round order: lexicographic sort would put r100 between
    r10 and r11, making 'latest status' come from the wrong round."""
    import re

    m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
    return int(m.group(1)) if m else 0


def main() -> None:
    files = sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")), key=_round_key
    )
    sampled: dict[str, list[str]] = {}
    latest_green: dict[str, bool] = {}
    for path in files:  # sorted => later rounds overwrite latest status
        with open(path) as fh:
            data = json.load(fh)
        tag = os.path.basename(path)
        for name, result in data.items():
            sampled.setdefault(name, []).append(tag)
            latest_green[name] = _is_green(result)
    red_latest = sorted(n for n, ok in latest_green.items() if not ok)

    lines = [
        '"""Queries the driver has sampled in past rounds (GENERATED).',
        "",
        "Regenerate with ``python tools/gen_driver_sampled.py`` after each",
        "round's CORRECTNESS_r{N}.json lands (tests/conftest.py also",
        "auto-regens at pytest session start). plans/catalog.py orders the",
        "catalog red-at-latest-sampling first (so fixes re-validate the",
        "very next round), then never-sampled, then the green remainder.",
        '"""',
        "",
        "# source files: " + ", ".join(os.path.basename(p) for p in files),
        "",
        "DRIVER_SAMPLED: frozenset[str] = frozenset({",
    ]
    for name in sorted(sampled):
        lines.append(f'    "{name}",  # {", ".join(sampled[name])}')
    lines += [
        "})",
        "",
        "# Names whose LATEST driver sampling was red (any *_match false or",
        "# an error): the catalog puts these FIRST — ahead even of",
        "# never-sampled names — so every fix is re-validated by the very",
        "# next round's ~50-query prefix instead of waiting out the",
        "# rotation (VERDICT r7 items 1 and 5).",
        "DRIVER_RED_LATEST: frozenset[str] = frozenset({",
    ]
    for name in red_latest:
        lines.append(f'    "{name}",')
    lines += ["})", ""]
    content = "\n".join(lines)
    # write only on change: keeps mtimes stable and makes the call safe
    # from pytest_configure (tests/conftest.py auto-regens each session
    # so the freshness check can never be red for bookkeeping reasons —
    # VERDICT r7 item 2, fourth round of the same tripwire)
    try:
        with open(OUT) as fh:
            unchanged = fh.read() == content
    except OSError:
        unchanged = False
    if not unchanged:
        # atomic replace: pytest_configure may run this concurrently
        # under parallel test runners — a non-atomic in-place write
        # could leave a half-written module for another process to
        # import (ADVICE r8).
        import tempfile

        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(OUT), prefix=".driver_sampled.", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as fh:
                fh.write(content)
            os.replace(tmp, OUT)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    print(
        f"{'unchanged' if unchanged else 'wrote'} {OUT}: "
        f"{len(sampled)} sampled names from {len(files)} rounds; "
        f"{len(red_latest)} red at latest sampling: {red_latest}"
    )


if __name__ == "__main__":
    main()
