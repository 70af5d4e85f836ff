#!/usr/bin/env python
"""Stage the next round's driver-window rotation from a CORRECTNESS file.

Usage: python scripts/fold_round_greens.py CORRECTNESS_r10.json [round_no]

Does two things:

1. PRINTS, ready to paste into operators/catalog.py:
   - the DRIVER_GREENS_R<N> frozenset literal — the file's hash-green
     names minus sentinels and minus rows-only entries (rows-only rows
     give weaker evidence and stay out of the green cohorts, exactly as
     rounds 1-9 were folded);
   - the line to append to DRIVER_GREEN_COHORTS;
   - the next window via catalog.next_window() recomputed AS IF the
     fold had landed (reds re-enter automatically: eligibility is
     green-cohort membership; code-changed greens re-enter via the
     content-hash freshness key), so the rotation commit is mechanical
     and the set-equality tests in tests/test_catalog_order.py stay
     the gate.

2. UPDATES operators/green_hashes.json IN PLACE: every hash-green row
   in the CORRECTNESS file (new fold AND freshness re-check alike)
   records query_content_hash(name) as of the folding commit — the
   code the driver actually proved. next_window() re-enters any cohort
   name whose current hash has drifted from this record (r9 verdict
   task 7: rotation keyed on (cohort age, code change), not age
   alone). The json write is the ONLY side effect; catalog.py itself
   is never edited — the fold is a reviewed commit, not a side effect.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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
    round_no = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rows = json.load(open(path))
    sentinels = set(C.DRIVER_SENTINELS)
    rows_only = {n for n, (_, sql) in C.CATALOG.items() if sql is None}
    all_greens = sorted(
        n
        for n, r in rows.items()
        if r.get("hash_match")
        and r.get("rows_match")
        and r.get("schema_match")
        and not r.get("err")
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
    greens = [
        n
        for n in all_greens
        if n not in sentinels and n not in C.DRIVER_CHECKED_PRIOR_ROUNDS
    ]
    rechecks = [n for n in all_greens if n not in greens]
    print(f"# {len(greens)} hash-greens to fold; reds/errs: {reds or 'none'}")
    if rechecks:
        print(
            f"# re-proven greens (hash refreshed, not re-folded): {rechecks}"
        )
    print(f"DRIVER_GREENS_R{round_no} = frozenset({{")
    if greens:
        print(_fmt_set(greens) + ",")
    print("})")
    print(
        f"# append to DRIVER_GREEN_COHORTS: ..., DRIVER_GREENS_R{round_no},"
    )

    # refresh the content-hash record for every name the driver just
    # proved green (fold + re-check) — ONCE per CORRECTNESS file. The
    # legitimate run happens at round start, on the same checkout the
    # driver drove at round end; a LATER re-run (after edits) must not
    # re-bless current code against an old green (that would clear
    # staleness without a driver run and defeat the (cohort age,
    # code change) rotation key). The ``__folded_files__`` dunder key
    # records which CORRECTNESS files have already blessed hashes;
    # cohort iteration in next_window()/tests touches names only.
    hpath = os.path.join(
        REPO, "dbms_query_optimizer_spark", "operators", "green_hashes.json"
    )
    recorded = C.green_hashes()
    folded_files = recorded.get("__folded_files__", [])
    fname = os.path.basename(path)
    if fname in folded_files:
        print(
            f"# green_hashes.json: {fname} already folded — hash refresh "
            "SKIPPED (a re-run after edits must not bless undriven code; "
            "edited names re-enter the window via next_window())"
        )
    else:
        for n in all_greens:
            recorded[n] = C.query_content_hash(n)
        recorded["__folded_files__"] = folded_files + [fname]
        with open(hpath, "w") as f:
            json.dump(
                dict(sorted(recorded.items())), f, indent=0, sort_keys=True
            )
        print(f"# green_hashes.json: refreshed {len(all_greens)} entries")

    # record the LAST-green round for every name this file proved (fold
    # and re-check alike) — next_window() orders freshness re-checks by
    # this, so the walk advances onto the stalest evidence (r10 verdict
    # task 3). Guarded by the same __folded_files__ idempotence key as
    # the hash refresh (a re-run must not re-date greens).
    rpath = os.path.join(
        REPO, "dbms_query_optimizer_spark", "operators", "green_rounds.json"
    )
    last_green = dict(C.green_rounds())
    if fname not in folded_files:
        for n in all_greens:
            last_green[n] = max(last_green.get(n, 0), round_no)
        with open(rpath, "w") as f:
            json.dump(
                dict(sorted(last_green.items())), f, indent=0, sort_keys=True
            )
        print(f"# green_rounds.json: stamped {len(all_greens)} entries r{round_no}")

    # next window AS IF the fold had landed
    folded = C.DRIVER_CHECKED_PRIOR_ROUNDS | set(greens)
    cohorts = list(C.DRIVER_GREEN_COHORTS) + [frozenset(greens)]
    sent = list(C.DRIVER_SENTINELS)
    taken = set(sent)
    out = list(sent)
    ungreen = [n for n in C.CATALOG if n not in folded and n not in taken]
    stale = [
        n
        for co in cohorts
        for n in sorted(co)
        if n not in taken and recorded.get(n) != C.query_content_hash(n)
    ]
    fresh_order = sorted(
        (last_green.get(n, 0), ci, n)
        for ci, co in enumerate(cohorts)
        for n in co
    )
    for name in ungreen + stale + [n for _, _, n in fresh_order]:
        if len(out) >= 50:
            break
        if name not in taken:
            taken.add(name)
            out.append(name)
    print(f"\n# next window ({len(out)} names; sentinels first, then")
    print("# never-green, then hash-stale greens, then stalest-last-green):")
    print(f"R{round_no + 1}_PLANNED_WINDOW = [")
    for n in out[len(sent):]:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
