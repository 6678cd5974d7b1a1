#!/usr/bin/env python3
"""Host-normalized cross-round bench comparison.

Reads two BENCH_FULL-style JSON files (the one-line graft.Bench
contract) and emits the per-query regression table BENCH_NOTES used to
hand-write, with every ratio divided by a calibration ratio so host
drift (this machine is shared; calibration kernels swung 2x across
rounds on identical code) is separated from real regressions.

TWO anchors since round 12: `calibration_sec` (the kernel on one
thread) and `calibration_par_sec` (the same kernel on all cores at
once). The suite queries run at local[32] and are parallel-bound, so
when BOTH artifacts carry the parallel anchor, the parallel host
factor is the one that classifies regressions — round 12 proved the
single-thread anchor OVERCORRECTS in degraded-parallelism windows
(1-thread kernel 25% faster while the 32-thread scan ran 2.3x
slower). The single-thread-adjusted ratio stays in the table as
context. Dev tool only — not part of the shipped library.

Usage: bench_report.py <old_bench.json> <new_bench.json> [threshold=1.5] [min_sec=0.5]
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path, threshold=1.5, min_sec=0.5):
    old, new = load(old_path), load(new_path)
    cal_old = old.get("calibration_sec")
    cal_new = new.get("calibration_sec")
    norm = (cal_new / cal_old) if cal_old and cal_new else 1.0
    cp_old, cp_new = old.get("calibration_par_sec"), new.get("calibration_par_sec")
    # the classifying factor: parallel when both rounds measured it,
    # single-thread otherwise (pre-round-12 artifacts lack the field)
    norm_par = (cp_new / cp_old) if cp_old and cp_new else None
    classify = norm_par if norm_par is not None else norm
    which = "parallel" if norm_par is not None else "single-thread"
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    rows = []
    for q in shared:
        if qo[q] <= 0:
            continue
        raw = qn[q] / qo[q]
        rows.append((q, qo[q], qn[q], raw, raw / norm, raw / classify))
    adj = [r[5] for r in rows]
    print(f"# Bench comparison: {old_path} -> {new_path}")
    print()
    print(f"- calibration_sec: {cal_old} -> {cal_new} "
          f"(single-thread host factor {norm:.3f})")
    if cp_new:
        pen_new = cp_new / cal_new if cal_new else float("nan")
        if norm_par is not None:
            print(f"- calibration_par_sec: {cp_old} -> {cp_new} "
                  f"(parallel host factor {norm_par:.3f}; "
                  f"concurrency penalty {cp_old / cal_old:.2f}x -> {pen_new:.2f}x)")
        else:
            print(f"- calibration_par_sec: (absent) -> {cp_new} "
                  f"(concurrency penalty {pen_new:.2f}x; healthy ~1.1-1.3x — "
                  f"older artifact lacks the field, parallel drift unmeasurable)")
    print(f"- CLASSIFYING anchor: {which} (adjusted = raw / {classify:.3f}); "
          f"adj_1t column = raw / single-thread factor, context only")
    print(f"- shared queries: {len(rows)}; new-only: "
          f"{sorted(set(qn) - set(qo))[:8]}{'...' if len(set(qn) - set(qo)) > 8 else ''}")
    if rows:
        print(f"- median adjusted ratio: {statistics.median(adj):.3f} "
              f"(single-thread-adjusted median "
              f"{statistics.median(r[4] for r in rows):.3f})")
        tot_old = sum(r[1] for r in rows)
        tot_new = sum(r[2] for r in rows)
        print(f"- shared-suite total: {tot_old:.1f}s -> {tot_new:.1f}s "
              f"(adjusted {tot_new / tot_old / classify:.3f}x)")
    for label, extra in [("scan_only_sec", "scan_only_mibps"),
                         ("jpeg_dense_sec", None),
                         ("warc_parse_mibps", None),
                         ("warc_gz_parse_mibps", None),
                         ("zorder_plain_sec", None),
                         ("zorder_zorder_sec", None)]:
        if label in old and label in new:
            line = f"- {label}: {old[label]:.3f} -> {new[label]:.3f}"
            if extra and extra in new:
                line += f" ({extra} {old.get(extra, 0):.0f} -> {new[extra]:.0f})"
            print(line)
    print()

    def table(rs):
        print("| query | old s | new s | raw | adjusted | adj_1t |")
        print("|---|---|---|---|---|---|")
        for q, o, n, raw, a1, ap in rs:
            print(f"| {q} | {o:.2f} | {n:.2f} | {raw:.2f}x | {ap:.2f}x | {a1:.2f}x |")
        print()

    reg = [r for r in rows if r[5] > threshold and r[2] > min_sec]
    win = [r for r in rows if r[5] < 1 / threshold and r[1] > min_sec]
    print(f"## Regressions (adjusted > {threshold}x and new > {min_sec}s): {len(reg)}")
    print()
    if reg:
        table(sorted(reg, key=lambda r: -r[5]))
    print(f"## Wins (adjusted < {1/threshold:.2f}x and old > {min_sec}s): {len(win)}")
    print()
    if win:
        table(sorted(win, key=lambda r: r[5]))
    print("## Largest adjusted drifts (context, any size)")
    print()
    table(sorted(rows, key=lambda r: -r[5])[:5])

    # Anchor sample spreads: a *_samples triple whose max/min ratio is
    # large marks a window outlier DIAGNOSABLE from the artifact alone
    # (the round-13 10x bm25 driver reading would have shown here).
    spread_keys = sorted(k for k in set(old) | set(new)
                         if k.endswith("_samples"))
    if spread_keys:
        print("## Anchor sample spreads (max/min per run; > 2.0 marks a noisy window)")
        print()
        print("| anchor | old samples | spread | new samples | spread |")
        print("|---|---|---|---|---|")
        for k in spread_keys:
            def fmt(d):
                xs = d.get(k)
                if not xs:
                    return "-", ""
                sp = max(xs) / min(xs) if min(xs) > 0 else float("inf")
                flag = " ⚠" if sp > 2.0 else ""
                return ("[" + ", ".join(f"{x:.2f}" for x in xs) + "]",
                        f"{sp:.2f}x{flag}")
            so, spo = fmt(old)
            sn, spn = fmt(new)
            print(f"| {k[:-8]} | {so} | {spo} | {sn} | {spn} |")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.5,
         float(sys.argv[4]) if len(sys.argv) > 4 else 0.5)
