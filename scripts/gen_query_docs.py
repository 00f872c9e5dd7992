#!/usr/bin/env python3
"""Regenerate docs/QUERIES.md from a Verify output directory.

Usage: python3 scripts/gen_query_docs.py /tmp/verify_out > docs/QUERIES.md

The output directory MUST be fresh (Verify overwrites per-query dirs but
never deletes stale ones, so a reused directory yields ghost rows for
since-renamed queries).

Groups queries by name prefix, marks each as oracle-gated (present in
oracle_sql.json) or rows+spec (approximate family), and records the
sf0.01 result row counts from the dumped parquet.
"""
import json
import sys

import pyarrow.parquet as pq
from pathlib import Path

FAMILIES = [
    ("qa_", "QA pipeline (reference parity)"),
    ("stream_", "Structured Streaming"),
    ("text_", "Text kernel"),
    ("rel_", "Relational / analytics"),
    ("adv_", "Advanced (fuzzy / composite / windows)"),
    ("dedup_", "Deduplication"),
    ("sim_", "Similarity / embeddings"),
    ("ta_", "Text analysis / corpus curation"),
    ("mm_", "Multimodal plumbing"),
]


def main(outdir: str, times_path: str = "") -> None:
    out = Path(outdir)
    oracles = set(json.loads((out / "oracle_sql.json").read_text()).keys())
    # optional per-oracle DuckDB wall seconds (check_oracle.py dumps
    # oracle_times.json next to its run); pass the sf0.1 one explicitly
    # to publish full-scale gate costs
    tp = Path(times_path) if times_path else out / "oracle_times.json"
    times = json.loads(tp.read_text()) if tp.exists() else {}
    rows = {}
    for p in sorted(out.iterdir()):
        if p.name == "oracle_sql.json" or p.name.startswith("."):
            continue
        try:
            rows[p.name] = pq.read_table(str(p)).num_rows
        except Exception:
            continue

    print("# Query catalog")
    print()
    print("One row per driver-checkable query (`SparkEntry.queries`). "
          "\"oracle\" means a\nDuckDB hash-compare gate at sf0.01; "
          "approximate-family queries are rows-only\nchecked by the driver "
          "and carry recall/contract specs instead. Row counts are\nthe "
          "sf0.01 result sizes. Implementation notes live in README.md and "
          "the\nper-module Scaladoc.")
    print()
    print("Regenerate: `sbt \"runMain graft.Verify /root/testdata/sf0.01 "
          "/tmp/v\"` then\n`python3 scripts/gen_query_docs.py /tmp/v "
          "[oracle_times.json] > docs/QUERIES.md`.")
    if times:
        print("\nThe `oracle s` column is the DuckDB wall time of each "
              "oracle in the\ngate run the times file came from (fast-path "
              "prelude variant when\npresent) — the gate's cost budget. "
              "Gate-cost policy notes live in\nPERF_NOTES.")
    seen = set()
    for prefix, title in FAMILIES:
        names = sorted(n for n in rows if n.startswith(prefix))
        names = [n for n in names if n not in seen]
        if not names:
            continue
        seen.update(names)
        print(f"\n## {title} ({len(names)})\n")
        _table(names, oracles, rows, times)
    rest = sorted(n for n in rows if n not in seen)
    if rest:
        print(f"\n## Other ({len(rest)})\n")
        _table(rest, oracles, rows, times)


def _table(names, oracles, rows, times) -> None:
    if times:
        print("| query | check | rows@sf0.01 | oracle s |")
        print("|---|---|---|---|")
    else:
        print("| query | check | rows@sf0.01 |")
        print("|---|---|---|")
    for n in names:
        check = "oracle" if n in oracles else "rows + spec"
        if times:
            t = f"{times[n]:.1f}" if n in times else ""
            print(f"| `{n}` | {check} | {rows[n]} | {t} |")
        else:
            print(f"| `{n}` | {check} | {rows[n]} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
