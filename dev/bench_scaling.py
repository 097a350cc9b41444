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

Three-point mode (r11 verdict ask #4): a two-point fit cannot tell a
straight line from the knee of a curve — r10/r11 saw committed
exponents move 1.60 -> 0.40 on re-measurement. With THREE scales the
report fits alpha by least squares over the (log sf, log t) points and
reports CURVATURE = alpha(hi decade) - alpha(lo decade): a query whose
exponent GROWS with scale is flagged even while its fitted alpha is
still under the line, because the hi-decade exponent is the one that
extrapolates to 100x.

Usage: dev/bench_scaling.py <lo.json> <hi.json> [scale_ratio=10] [--md out.md]
       dev/bench_scaling.py <lo.json> <mid.json> <hi.json> \
           --ratios r_lo_mid r_mid_hi [--md out.md]
"""
import json, math, sys


CURVE_FLAG = 0.25  # alpha growth across decades worth reading the plan for


ALPHA_FLAG = 1.2   # the r9 verdict's superlinearity line
T_MIN = 1.0        # seconds at the HIGH sf below which alpha is noise


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[0])
    qs = {k: v for k, v in d["queries"].items() if v >= 0}
    # iso entries are [sweep, fresh_jvm] (<= r11) or
    # [sweep, fresh_jvm, child_start_loadavg1] (r12+)
    iso = {k: v[1] for k, v in (d.get("isolated") or {}).items()
           if isinstance(v, list) and len(v) >= 2 and v[1] >= 0}
    qs.update(iso)  # fresh-JVM rerun beats the contended sweep number
    return qs, d.get("sf", "?"), d.get("value"), set(iso)


def fit_alpha(points):
    """Least-squares slope of log t vs log sf over >= 2 (sf, t) points."""
    xs = [math.log(sf) for sf, _ in points]
    ys = [math.log(max(t, 1e-3)) for _, t in points]
    n = len(points)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def three_point(paths, ratios, md_out):
    (lo, lo_sf, _, lo_iso), (mid, mid_sf, _, mid_iso), (hi, hi_sf, _, hi_iso) = \
        [load(p) for p in paths]
    r1, r2 = ratios
    sfs = [1.0, r1, r1 * r2]
    common = sorted(set(lo) & set(mid) & set(hi))
    rows = []
    for q in common:
        a_lo = math.log(max(mid[q], 1e-3) / max(lo[q], 1e-3)) / math.log(r1)
        a_hi = math.log(max(hi[q], 1e-3) / max(mid[q], 1e-3)) / math.log(r2)
        a_fit = fit_alpha(list(zip(sfs, [lo[q], mid[q], hi[q]])))
        rows.append((q, lo[q], mid[q], hi[q], a_lo, a_hi, a_fit, a_hi - a_lo))
    rows.sort(key=lambda r: -r[5])
    # flag on the HI-decade exponent (it extrapolates to 100x) and on
    # growing curvature even when the fitted alpha is still under the line
    flag_super = [r for r in rows if r[5] > ALPHA_FLAG and r[3] >= T_MIN]
    flag_curve = [r for r in rows
                  if r[7] > CURVE_FLAG and r[5] > 1.0 and r[3] >= T_MIN
                  and r not in flag_super]
    lines = []
    lines.append(f"# Three-point scaling: {lo_sf} -> {mid_sf} -> {hi_sf} "
                 f"(ratios {r1:g}, {r2:g})")
    lines.append("")
    lines.append(f"- queries compared: {len(common)}")
    suite = fit_alpha(list(zip(sfs, [sum(d[q] for q in common)
                                     for d in (lo, mid, hi)])))
    lines.append(f"- suite totals: {sum(lo[q] for q in common):.1f}s -> "
                 f"{sum(mid[q] for q in common):.1f}s -> "
                 f"{sum(hi[q] for q in common):.1f}s; "
                 f"suite fitted alpha = {suite:.2f}")
    lines.append(f"- flagged alpha_hi > {ALPHA_FLAG}: {len(flag_super)}; "
                 f"curvature > {CURVE_FLAG} with alpha_hi > 1: "
                 f"{len(flag_curve)} (both with t_hi >= {T_MIN}s)")
    lines.append("")
    lines.append(f"| query | t({lo_sf.split('/')[-1]}) s | "
                 f"t({mid_sf.split('/')[-1]}) s | t({hi_sf.split('/')[-1]}) s "
                 f"| alpha_lo | alpha_hi | alpha_fit | curvature |")
    lines.append("| --- | --- | --- | --- | --- | --- | --- | --- |")
    for q, tl, tm, th, al, ah, af, cv in rows:
        mark = ""
        if (q, tl, tm, th, al, ah, af, cv) in flag_super:
            mark = " **<-- superlinear hi decade**"
        elif (q, tl, tm, th, al, ah, af, cv) in flag_curve:
            mark = " **<-- exponent growing**"
        def s(t, iso):
            return f"{t:.3f}" + (" iso" if q in iso else "")
        lines.append(f"| `{q}` | {s(tl, lo_iso)} | {s(tm, mid_iso)} | "
                     f"{s(th, hi_iso)} | {al:.2f} | {ah:.2f} | {af:.2f} | "
                     f"{cv:+.2f}{mark} |")
    text = "\n".join(lines)
    print(text)
    if md_out:
        with open(md_out, "w") as f:
            f.write(text + "\n")
        print(f"\n[written {md_out}]", file=sys.stderr)
    sys.exit(1 if flag_super or flag_curve else 0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md_out = None
    if "--md" in sys.argv:
        md_out = sys.argv[sys.argv.index("--md") + 1]
        if md_out in args:
            args.remove(md_out)
    if "--ratios" in sys.argv:
        i = sys.argv.index("--ratios")
        ratios = (float(sys.argv[i + 1]), float(sys.argv[i + 2]))
        for v in sys.argv[i + 1:i + 3]:
            if v in args:
                args.remove(v)
        three_point(args[:3], ratios, md_out)
        return
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
