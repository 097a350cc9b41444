#!/usr/bin/env python3
"""Round-over-round bench comparison (the r7 verdict's measurement fix).

The shared-JVM sweep drifts ±15% round-over-round from contention alone,
so a real 1.5x plan regression would be invisible in the totals. This
script compares two bench_full.json per-query maps and flags every query
that moved more than THRESH x in either direction — the short list to
rerun in isolation (`sbt "runMain graft.Bench <name> ..."`) before
believing (or dismissing) the movement.

Inputs are file paths or git revs of bench_full.json:
    python3 dev/bench_compare.py bench_full.json HEAD~1:bench_full.json
    python3 dev/bench_compare.py a1205da:bench_full.json bench_full.json

Exit code 0 always (it is a report, not a gate) — the gate is the
isolation rerun it tells you to do.
"""
import json
import subprocess
import sys

THRESH = 1.5


def load(spec: str) -> dict:
    if ":" in spec and not spec.startswith("/") and not spec.startswith("."):
        raw = subprocess.check_output(["git", "show", spec], text=True)
    else:
        with open(spec) as f:
            raw = f.read()
    return json.loads(raw)


def main(old_spec: str, new_spec: str) -> int:
    old_doc, new_doc = load(old_spec), load(new_spec)
    old, new = old_doc["queries"], new_doc["queries"]
    # Bench itself now reruns round-over-round movers in a fresh JVM and
    # records {sweep, isolated} pairs — surface them so nobody re-does
    # the rerun by hand.
    iso = new_doc.get("isolated") or {}
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"common queries: {len(common)}  "
          f"(+{len(added)} new, -{len(removed)} removed)")
    print(f"common-query total: {t_old:.1f}s -> {t_new:.1f}s  "
          f"({t_new / t_old - 1:+.1%} vs old)" if t_old else "no common queries")
    movers = []
    for q in common:
        a, b = old[q], new[q]
        if a <= 0 or b <= 0:
            continue  # failed run recorded as -1
        r = b / a
        if r > THRESH or r < 1 / THRESH:
            movers.append((r, q, a, b))
    movers.sort(reverse=True)
    if movers:
        print(f"\n{len(movers)} queries moved >{THRESH}x:")
        for r, q, a, b in movers:
            tail = ""
            if q in iso:
                tail = f"  [isolated fresh-JVM rerun: {iso[q][1]:.2f}s]"
            print(f"  {q}: {a:.2f}s -> {b:.2f}s  ({r:.2f}x){tail}")
        unresolved = [q for _, q, _, _ in movers if q not in iso]
        if unresolved:
            names = " ".join(unresolved)
            print(f'\n  movers without a recorded isolation number — rerun:\n'
                  f'  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 '
                  f'sbt -batch "runMain graft.Bench {names}"')
    else:
        print(f"\nno query moved >{THRESH}x — round-over-round movement is "
              f"within sweep noise")
    if added:
        print(f"\nnew queries this round: {len(added)}, "
              f"{sum(new[q] for q in added):.1f}s total")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
