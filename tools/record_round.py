"""Generate the per-round green-set code block for queries/__init__.py.

Usage: python tools/record_round.py CORRECTNESS_r05.json 5

Reads a driver correctness record and prints ready-to-paste
`_R{N}_GREEN` / `_R{N}_ROWS_ONLY` frozensets (hash-exact rows vs
clean rows-only-by-design), plus a summary of any red rows. Keeping
this mechanical is round-4 ask #7: window rotation must be derived
from recorded evidence, never hand-ordered.
"""

from __future__ import annotations

import json
import sys
import textwrap


def _block(name: str, names: list[str]) -> str:
    if not names:
        return f"{name} = frozenset()"
    body = ", ".join(repr(n) for n in sorted(names))
    wrapped = textwrap.fill(body, width=70, initial_indent="    ",
                            subsequent_indent="    ")
    return f"{name} = frozenset({{\n{wrapped},\n}})"


def main() -> int:
    path, rnd = sys.argv[1], int(sys.argv[2])
    rec = json.load(open(path))
    green, rows_only, red = [], [], []
    for name, row in rec.items():
        # A no-oracle row is clean rows-only evidence ONLY if the query
        # actually produced rows (strictly positive int) and nothing
        # else went wrong. A 0-row / None-row / extra-error record must
        # be RED: this tool drives window rotation, and a silently-empty
        # rows-only query must not be rotated out as evidenced.
        spark_rows = row.get("spark_rows")
        # not isinstance(bool): True would otherwise count as 1 row
        if (row.get("err") == "no_oracle"
                and isinstance(spark_rows, int)
                and not isinstance(spark_rows, bool)
                and spark_rows > 0):
            rows_only.append(name)
        elif (row.get("rows_match") and row.get("schema_match")
              and row.get("hash_match")):
            green.append(name)
        else:
            red.append((name, row))
    print(_block(f"_R{rnd}_GREEN", green))
    print()
    print(_block(f"_R{rnd}_ROWS_ONLY", rows_only))
    print()
    print(f"# {len(green)} hash-exact, {len(rows_only)} rows-only, "
          f"{len(red)} RED")
    for name, row in red:
        print(f"# RED: {name}: {row}")
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
