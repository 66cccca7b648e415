#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: bench_compare.py OLD.json NEW.json [ratio_threshold]

Both files are BENCH_r*.json / BENCH_RESULT.json artifacts carrying a
"queries" name->seconds map. Prints the common-query totals, the overall
ratio, and every query whose ratio exceeds the threshold (default 1.2),
sorted by absolute regression. Queries at -1 (failed) in either file are
listed separately and excluded from totals.
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


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
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


if __name__ == "__main__":
    main()
