#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: bench_compare.py OLD.json NEW.json [ratio_threshold]
           [--normalize OLD_CANARY.json NEW_CANARY.json]

Both files are BENCH_r*.json / BENCH_RESULT.json artifacts carrying a
"queries" name->seconds map. Prints the common-query totals, the overall
ratio, and every query whose ratio exceeds the threshold (default 1.2),
sorted by absolute regression. Queries at -1 (failed) in either file are
listed separately and excluded from totals.

--normalize divides the sweep ratio by the canary ratio (the fixed
10-query subset run from the PINNED round-10 jar via
tools/canary_bench.sh, back-to-back with each sweep). The canary's code
never changes, so day-to-day machine drift moves sweep and canary
together and cancels out of the normalized ratio; a real engine change
moves only the sweep. A normalized ratio near 1.0 under a raw ratio of
1.3 means "the machine got slower, the engine didn't".
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", {})
    # driver artifacts sometimes nest under "parsed"
    if not q and isinstance(d.get("parsed"), dict):
        q = d["parsed"].get("queries", {})
    return {k: float(v) for k, v in q.items()}


def common_totals(path_a, path_b):
    """Totals over the canary queries BOTH runs measured (the subset can
    grow between rounds; totals must stay apples-to-apples)."""
    a, b = load(path_a), load(path_b)
    names = [n for n in sorted(set(a) & set(b)) if a[n] >= 0 and b[n] >= 0]
    return sum(a[n] for n in names), sum(b[n] for n in names), len(names)


def main():
    args = sys.argv[1:]
    canary = None
    if "--normalize" in args:
        i = args.index("--normalize")
        canary = (args[i + 1], args[i + 2])
        args = args[:i] + args[i + 3:]
    old_path, new_path = args[0], args[1]
    thr = float(args[2]) if len(args) > 2 else 1.2
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    failed = [n for n in common if old[n] < 0 or new[n] < 0]
    ok = [n for n in common if n not in failed]
    t_old = sum(old[n] for n in ok)
    t_new = sum(new[n] for n in ok)
    print(f"common queries: {len(common)} ({len(failed)} failed excluded)")
    print(f"old total: {t_old:.1f}s  new total: {t_new:.1f}s  "
          f"ratio: {t_new / t_old:.3f}")
    print(f"only in old: {len(set(old) - set(new))}  "
          f"only in new: {len(set(new) - set(old))}")
    regress = [(n, old[n], new[n], new[n] / old[n])
               for n in ok if old[n] > 0 and new[n] / old[n] > thr]
    regress.sort(key=lambda r: r[2] - r[1], reverse=True)
    if regress:
        print(f"\nqueries over {thr}x (by absolute cost delta):")
        for n, o, w, r in regress:
            print(f"  {n:35s} {o:7.3f} -> {w:7.3f}  ({r:.2f}x)")
    improve = [(n, old[n], new[n], new[n] / old[n])
               for n in ok if new[n] > 0 and old[n] / new[n] > thr]
    improve.sort(key=lambda r: r[1] - r[2], reverse=True)
    if improve:
        print(f"\nqueries improved past {thr}x:")
        for n, o, w, r in improve[:15]:
            print(f"  {n:35s} {o:7.3f} -> {w:7.3f}  ({r:.2f}x)")
    if failed:
        print("\nfailed somewhere:", ", ".join(failed))
    if canary:
        c_old, c_new, n_c = common_totals(canary[0], canary[1])
        raw = t_new / t_old
        c_ratio = c_new / c_old
        print(f"\ncanary (pinned r10 jar, {n_c} common queries): "
              f"old {c_old:.1f}s  new {c_new:.1f}s  ratio: {c_ratio:.3f}")
        print(f"NORMALIZED sweep ratio (sweep ÷ canary drift): "
              f"{raw / c_ratio:.3f}")


if __name__ == "__main__":
    main()
