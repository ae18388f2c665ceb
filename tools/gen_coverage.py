#!/usr/bin/env python
"""Regenerate the query table + totals inside COVERAGE.md from the live
``__spark_entry__`` registry, keeping the hand-written prose (header and
"non-query surfaces" tail) intact.

Run from the repo root: ``python tools/gen_coverage.py``.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrypoint  # noqa: E402

#: Extra detail for rows-only entries (everything else gets the default).
ROWS_ONLY_NOTES = {
    "q_agg_sketch_distinct": (
        "rows-only (engine-specific HLL sketch; ≤5% accuracy pytest-asserted)"
    ),
}
DEFAULT_ROWS_ONLY = "rows-only (approx/side-effecting)"

ANNOTATIONS = {
    "q_decontaminate": "DuckDB hash-match (train/eval n-gram leakage join)",
}


def main() -> None:
    queries = entrypoint.queries()
    oracle = entrypoint.oracle_sql()
    modules = {}
    for mod in entrypoint._MODULES:
        prefix = "mysqldump_to_parquet_spark."
        short = mod.__name__.removeprefix(prefix)
        for key in mod.QUERIES:
            modules[key] = short

    lines = ["| queries() key | module | correctness check |", "|---|---|---|"]
    for key in sorted(queries):
        if key in oracle:
            check = ANNOTATIONS.get(key, "DuckDB hash-match")
        else:
            check = ROWS_ONLY_NOTES.get(key, DEFAULT_ROWS_ONLY)
        lines.append(f"| `{key}` | `{modules[key]}` | {check} |")
    n_rows_only = sum(1 for k in queries if k not in oracle)
    lines.append("")
    lines.append(
        f"Total: {len(queries)} queries, {len(queries) - n_rows_only} "
        f"oracle-checked ({n_rows_only} rows-only by design: approximate"
    )
    lines.append("or side-effecting ops).")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    text = open(path).read()
    # Replace from the table header through the "Total: ..." sentence.
    new = re.sub(
        r"\| queries\(\) key \| module \| correctness check \|.*?or side-effecting ops\)\.",
        "\n".join(lines),
        text,
        flags=re.S,
    )
    open(path, "w").write(new)
    print(f"COVERAGE.md: {len(queries)} queries, {n_rows_only} rows-only")


if __name__ == "__main__":
    main()
