#!/usr/bin/env python3
"""Compare two bench_self.json files and flag per-query movers.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold]

Both files are the full-line output of graft.Bench (the gitignored
bench_self.json). Queries whose NEW/OLD ratio exceeds the threshold
(default 2.0) in either direction are listed, worst first. With the
two-opposite-pass min estimator both sides are already position-noise
resistant, so a >2x mover is worth reading as a real plan change —
check `git log` for the query and diff docs/PLANS.md.

Exit code: 0 when nothing moved, 1 when at least one query did.
"""
import json
import sys

old_path, new_path = sys.argv[1], sys.argv[2]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

old = json.load(open(old_path))
new = json.load(open(new_path))
qo, qn = old["queries"], new["queries"]

movers = []
for name in sorted(set(qo) & set(qn)):
    a, b = qo[name], qn[name]
    if a <= 0 or b <= 0:
        continue  # failed on one side: listed separately below
    # ignore sub-50ms pairs: pure scheduling jitter at that scale
    if max(a, b) < 0.05:
        continue
    ratio = b / a
    if ratio > threshold or ratio < 1 / threshold:
        movers.append((ratio, name, a, b))

only_old = sorted(set(qo) - set(qn))
only_new = sorted(set(qn) - set(qo))
failed = sorted([q for q, v in qn.items() if v < 0])

print(f"old: {old_path} (total {old.get('value')}s, {len(qo)} queries)")
print(f"new: {new_path} (total {new.get('value')}s, {len(qn)} queries)")
if only_old:
    print(f"removed: {', '.join(only_old)}")
if only_new:
    print(f"added:   {', '.join(only_new)}")
if failed:
    print(f"FAILED in new: {', '.join(failed)}")
if not movers:
    print(f"no query moved >{threshold}x in either direction")
    sys.exit(1 if failed else 0)
print(f"\n{len(movers)} queries moved >{threshold}x (worst first):")
for ratio, name, a, b in sorted(movers, key=lambda m: -max(m[0], 1 / m[0])):
    arrow = "slower" if ratio > 1 else "faster"
    print(f"  {name}: {a:.3f}s -> {b:.3f}s  ({ratio:.2f}x {arrow})")
sys.exit(1)
