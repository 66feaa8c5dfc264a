"""Regenerate SURVEY.md's auto-generated catalog index section.

Usage: python tools/gen_catalog_index.py  (rewrites SURVEY.md in place)

The section starts at the "## Catalog index" heading and runs to EOF;
everything above it is preserved verbatim.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from data_integration_project_spark import plans  # noqa: E402

MARK = "## Catalog index (auto-generated; one row per `queries()` entry)"


def main() -> None:
    survey = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    text = survey.read_text()
    head = text.split(MARK)[0].rstrip() + "\n"

    n = len(plans.REGISTRY)
    n_oracled = sum(1 for s in plans.REGISTRY.values() if s.oracle is not None)
    cover = (
        "every one with a DuckDB oracle twin."
        if n_oracled == n
        else f"{n_oracled} with a DuckDB oracle twin."
    )
    lines = [
        head,
        f"{MARK}\n",
        f"{n} queries, {cover}\n",
        "| query | plan module | summary |",
        "|---|---|---|",
    ]
    for name in sorted(plans.REGISTRY):
        spec = plans.REGISTRY[name]
        module = spec.fn.__module__.rsplit(".", 1)[-1] + ".py"
        first = (spec.doc or "").strip().splitlines()
        summary = (first[0] if first else "").rstrip(" .")[:64].replace("|", "/")
        lines.append(f"| `{name}` | {module} | {summary} |")
    survey.write_text("\n".join(lines) + "\n")
    print(f"wrote {n} rows ({n_oracled} oracled) to {survey}")


if __name__ == "__main__":
    main()
