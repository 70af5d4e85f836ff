#!/usr/bin/env python
"""Stage the next round's driver-window rotation from a CORRECTNESS file.

Usage: python scripts/fold_round_greens.py CORRECTNESS_r09.json [round_no]

Prints, ready to paste into operators/catalog.py:
  1. the DRIVER_GREENS_R<N> frozenset literal — the file's hash-green
     names minus sentinels and minus rows-only entries (rows-only rows
     give weaker evidence and stay out of the green cohorts, exactly as
     rounds 1-8 were folded);
  2. the line to append to DRIVER_GREEN_COHORTS;
  3. the next window via r10_window() recomputed AS IF the fold had
     landed (reds re-enter automatically: eligibility is green-cohort
     membership), so the rotation commit is mechanical and the
     set-equality tests in tests/test_catalog_order.py stay the gate.

Read-only: this script never edits catalog.py itself — the fold is a
reviewed commit, not a side effect.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_query_optimizer_spark.operators import catalog as C


def _fmt_set(names: list[str], indent: str = "    ") -> str:
    body = ", ".join(f'"{n}"' for n in sorted(names))
    return "\n".join(
        textwrap.wrap(
            body, width=72, initial_indent=indent, subsequent_indent=indent
        )
    )


def main() -> None:
    path = sys.argv[1]
    round_no = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    rows = json.load(open(path))
    sentinels = set(C.DRIVER_SENTINELS)
    rows_only = {n for n, (_, sql) in C.CATALOG.items() if sql is None}
    greens = sorted(
        n
        for n, r in rows.items()
        if r.get("hash_match")
        and r.get("rows_match")
        and r.get("schema_match")
        and not r.get("err")
        and n not in sentinels
        and n not in rows_only
    )
    reds = sorted(
        n
        for n, r in rows.items()
        if n not in sentinels
        and n not in rows_only
        and (
            r.get("err")
            or not (
                r.get("hash_match")
                and r.get("rows_match")
                and r.get("schema_match")
            )
        )
    )
    already = [n for n in greens if n in C.DRIVER_CHECKED_PRIOR_ROUNDS]
    print(f"# {len(greens)} hash-greens to fold; reds/errs: {reds or 'none'}")
    if already:
        print(f"# NOTE: already in a cohort (re-checks, do NOT re-fold): {already}")
        greens = [n for n in greens if n not in C.DRIVER_CHECKED_PRIOR_ROUNDS]
    print(f"DRIVER_GREENS_R{round_no} = frozenset({{")
    if greens:
        print(_fmt_set(greens) + ",")
    print("})")
    print(
        f"# append to DRIVER_GREEN_COHORTS: ..., DRIVER_GREENS_R{round_no},"
    )
    folded = C.DRIVER_CHECKED_PRIOR_ROUNDS | set(greens)
    sent = list(C.DRIVER_SENTINELS)
    taken = set(sent)
    out = list(sent)
    ungreen = [n for n in C.CATALOG if n not in folded and n not in taken]
    cohorts = list(C.DRIVER_GREEN_COHORTS) + [frozenset(greens)]
    for name in ungreen + [n for co in cohorts for n in sorted(co)]:
        if len(out) >= 50:
            break
        if name not in taken:
            taken.add(name)
            out.append(name)
    print(f"\n# next window ({len(out)} names, sentinels first):")
    print(f"R{round_no + 1}_PLANNED_WINDOW = [")
    print(_fmt_set(out[len(sent):]) + ",")
    print("]")


if __name__ == "__main__":
    main()
