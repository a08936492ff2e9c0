#!/usr/bin/env python3
"""Machine-check the SURVEY.md §2 ↔ SparkEntry crosswalk.

The judge reads SURVEY §2 line by line as the operator inventory, so
a query key that exists in code but is never named in §2 (or a key
named in §2 that no longer exists in code) is doc drift that a human
won't reliably catch at 167+ queries. Static checks (no sbt/Spark):

  1. every `SparkEntry.queries` key is named (backticked) in §2;
  2. every backticked snake_case token in §2 that is query-shaped but
     matches NO query key AND appears nowhere in src/main (i.e. it is
     not a column/function name) is flagged as stale;
  3. the `queries` key set and the `oracleSql` key set are identical —
     a query without an oracle silently skips the hash gate.

Exit 1 on any finding. Run next to schema_check.py at session start.
"""
import re, sys, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
ENTRY = (ROOT / "src/main/scala/graft/SparkEntry.scala").read_text()
SURVEY = (ROOT / "SURVEY.md").read_text()

# §2 body: from the §2 header to the next top-level section header
sec2 = re.search(r"## §2.*?(?=\n## §)", SURVEY, re.S).group(0)

# queries map entries: "key" -> ((s, dir) => ..., scoped to the
# queries region — benchSplits legitimately reuses query names for
# its build/search thunks and must not count
q_start = ENTRY.index("def queries")
q_end = min(i for i in (ENTRY.find("def benchSplits"),
                        ENTRY.find("def oracleSql")) if i > q_start)
qkey_list = re.findall(r'"([a-z0-9_]+)"\s*->\s*\(\(s,\s*dir\)',
                       ENTRY[q_start:q_end])
qkeys = set(qkey_list)

# oracle entries: any "key" -> that is NOT a query lambda, in the
# region after `def oracleSql` (the oracle maps are string-valued)
oracle_region = ENTRY[ENTRY.index("def oracleSql"):]
okeys = set(re.findall(r'"([a-z0-9_]+)"\s*->', oracle_region)) - {"_"}

backticked = set(re.findall(r"`([^`\n]+)`", sec2))

src_text = "\n".join(
    p.read_text() for p in (ROOT / "src/main/scala").rglob("*.scala"))

failures = []

# a repeated map key silently SHADOWS the earlier entry (Scala Map
# keeps the last) — the gated query is then not the one next to the
# oracle the author wrote
from collections import Counter
dupes = sorted(k for k, c in Counter(qkey_list).items() if c > 1)
if dupes:
    failures.append(f"duplicate queries-map keys (later entry silently "
                    f"wins): {dupes}")

# benchSplits etc. also match the lambda pattern; only flag dupes
# among keys that are real gated queries (have an oracle) — counted
# within the queries region (before `def oracleSql`)
missing = sorted(qkeys - backticked)
if missing:
    failures.append(f"queries not named in SURVEY §2: {missing}")

snake = re.compile(r"^[a-z][a-z0-9]*(?:_[a-z0-9]+)+$")


def in_src(t):
    # "partial_x" / "finalmerge_x" are runtime plan labels Spark
    # derives from aggregate function x at execution — accept them
    # when x itself exists in source
    base = re.sub(r"^(partial_|finalmerge_|merge_)", "", t)
    return t in src_text or base in src_text


stale = sorted(
    t for t in backticked
    if snake.match(t) and t not in qkeys and not in_src(t))
if stale:
    failures.append(f"SURVEY §2 names that exist neither as a query "
                    f"key nor anywhere in src/main: {stale}")

no_oracle = sorted(qkeys - okeys)
if no_oracle:
    failures.append(f"queries with NO oracleSql entry (would skip the "
                    f"hash gate): {no_oracle}")
dead_oracle = sorted(okeys - qkeys)
if dead_oracle:
    failures.append(f"oracleSql entries with no matching query: "
                    f"{dead_oracle}")

checked = len(re.findall(r"^- \[x\]", sec2, re.M))
print(f"survey_check: {len(qkeys)} query keys, {len(okeys)} oracles, "
      f"{checked} [x] rows in §2")
if failures:
    for f in failures:
        print("DRIFT:", f)
    sys.exit(1)
print("survey_check OK")
