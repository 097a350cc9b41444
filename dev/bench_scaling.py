#!/usr/bin/env python3
"""Two-point per-query scaling report (r9 verdict ask #1).

Reads two Bench outputs of the SAME suite at two scale factors and fits
each query's scaling exponent

    alpha = log(t_hi / t_lo) / log(scale_ratio)

alpha ~ 0 -> flat (dimension-sized work; scan time hidden by overhead)
alpha ~ 1 -> linear in the data (the Spark ideal for scan/agg/join)
alpha > ALPHA_FLAG -> superlinear: read the plan; at 100x this query is
                      the bottleneck even if it looks fine at sf0.1.

Sub-second t_lo timings are mostly fixed overhead (codegen, task
dispatch), which UNDERSTATES alpha for cheap queries and never hides a
superlinear one, so the report flags on alpha alone but also prints a
floor-filtered view (t_hi >= T_MIN) where the exponent is trustworthy.

Isolated pairs (r10 verdict ask #5): when a Bench JSON carries an
"isolated" map ({query: [sweep_s, fresh_jvm_s]}), the isolated time
REPLACES the sweep time for that query on that side — the r10 record
showed sweep-vs-isolated gaps of 3x on heavy queries under host
contention, so an alpha fit on unisolated sweep numbers can flag (or
hide) the wrong queries. Replaced queries are marked `iso` in the table.

Usage: dev/bench_scaling.py <lo.json> <hi.json> [scale_ratio=10] [--md out.md]
"""
import json, math, sys


ALPHA_FLAG = 1.2   # the r9 verdict's superlinearity line
T_MIN = 1.0        # seconds at the HIGH sf below which alpha is noise


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[0])
    qs = {k: v for k, v in d["queries"].items() if v >= 0}
    iso = {k: v[1] for k, v in (d.get("isolated") or {}).items()
           if isinstance(v, list) and len(v) == 2 and v[1] >= 0}
    qs.update(iso)  # fresh-JVM rerun beats the contended sweep number
    return qs, d.get("sf", "?"), d.get("value"), set(iso)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md_out = None
    if "--md" in sys.argv:
        md_out = sys.argv[sys.argv.index("--md") + 1]
        if md_out in args:
            args.remove(md_out)
    lo_path, hi_path = args[0], args[1]
    ratio = float(args[2]) if len(args) > 2 else 10.0
    lo, lo_sf, lo_total, lo_iso = load(lo_path)
    hi, hi_sf, hi_total, hi_iso = load(hi_path)
    common = sorted(set(lo) & set(hi))
    only_lo, only_hi = sorted(set(lo) - set(hi)), sorted(set(hi) - set(lo))
    rows = []
    for q in common:
        tl, th = max(lo[q], 1e-3), max(hi[q], 1e-3)
        alpha = math.log(th / tl) / math.log(ratio)
        rows.append((q, lo[q], hi[q], alpha))
    rows.sort(key=lambda r: -r[3])
    suite_alpha = math.log(sum(hi[q] for q in common) /
                           sum(lo[q] for q in common)) / math.log(ratio)
    flagged = [r for r in rows if r[3] > ALPHA_FLAG]
    flagged_solid = [r for r in flagged if r[2] >= T_MIN]

    lines = []
    lines.append(f"# Per-query scaling exponents: {lo_sf} -> {hi_sf} "
                 f"(ratio {ratio:g})")
    lines.append("")
    lines.append(f"- queries compared: {len(common)}"
                 + (f" (only in lo: {only_lo})" if only_lo else "")
                 + (f" (only in hi: {only_hi})" if only_hi else ""))
    lines.append(f"- suite totals: {sum(lo[q] for q in common):.1f}s -> "
                 f"{sum(hi[q] for q in common):.1f}s; "
                 f"suite exponent alpha = {suite_alpha:.2f}")
    lines.append(f"- flagged alpha > {ALPHA_FLAG}: {len(flagged)} "
                 f"({len(flagged_solid)} with t_hi >= {T_MIN}s, the "
                 f"trustworthy set)")
    lines.append("")
    lines.append(f"| query | t({lo_sf.split('/')[-1]}) s | "
                 f"t({hi_sf.split('/')[-1]}) s | alpha |")
    lines.append("| --- | --- | --- | --- |")
    shown = [r for r in rows if r[3] > ALPHA_FLAG or r[2] >= T_MIN]
    for q, tl, th, a in shown:
        mark = " **<-- superlinear**" if a > ALPHA_FLAG and th >= T_MIN else (
            " (flagged, but t_hi below floor)" if a > ALPHA_FLAG else "")
        tls = f"{tl:.3f}" + (" iso" if q in lo_iso else "")
        ths = f"{th:.3f}" + (" iso" if q in hi_iso else "")
        lines.append(f"| `{q}` | {tls} | {ths} | {a:.2f}{mark} |")
    lines.append("")
    lines.append(f"(rows with alpha <= {ALPHA_FLAG} AND t_hi < {T_MIN}s "
                 f"omitted: {len(rows) - len(shown)} queries, all cheap "
                 f"and at-worst-linear)")
    text = "\n".join(lines)
    print(text)
    if md_out:
        with open(md_out, "w") as f:
            f.write(text + "\n")
        print(f"\n[written {md_out}]", file=sys.stderr)
    # exit 1 when a trustworthy superlinear query exists -> CI-able
    sys.exit(1 if flagged_solid else 0)


if __name__ == "__main__":
    main()
