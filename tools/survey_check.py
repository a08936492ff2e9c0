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


# --- rounded-double output lint (the r10 price_qty_regression
# incident class): round() on a double that can be TINY NEGATIVE
# maps to -0.0 in DuckDB but +0.0 through Spark's BigDecimal Round,
# and the driver hashes floats TYPED, so the signed zeros diverge.
# The repo-wide rule after the r11 sweep: a rounded double may reach
# a FINAL select only when its value provably cannot land in
# (-halfulp, 0) — everything sign-crossing ships as a fixed-point
# BIGINT (CAST(round(v * 1eN) AS BIGINT) AS <name>_eN). This lint
# flags any bare round( in a final select whose output alias is not
# in the audited allowlist below. Adding an alias here REQUIRES the
# non-negativity argument in the comment group.
NONNEG_ROUND_ALLOW = {
    # monetary/quantity sums of positive columns (TPC-H prices,
    # events.value >= 0.01): bounded away from zero
    "revenue", "revenue_k", "sum_qty", "total", "total_price",
    "total_revenue", "total_value", "promo_revenue", "promo_pct",
    "avg_yearly", "price", "s_acctbal", "value", "purchase_value",
    "sum_v",
    # distances/norms: sqrt >= 0, or cosine-dist clamped to [0,2]
    # by the shared least/greatest clamp in cosSql/vec_cosine
    "dist", "score", "pos_dist", "neg_dist",
    # ratios/entropies/estimates of non-negative quantities
    "jaccard", "containment", "frac", "density", "dup_frac",
    "top_frac", "purity", "precision", "recall", "ndcg", "rrf",
    "fused", "entropy", "eff_vocab", "xent", "xent2", "xent_train",
    "xent_val", "h_rate", "hll_est", "merged_hll", "direct_hll",
    "kmv_inter", "gini", "chi2", "vmr", "dispersion", "mib",
    "pred_fpr", "avg_k", "avg_len", "stop_ratio", "mean_q",
    "quality", "nat_share", "temp_share", "upweight", "strength",
    "cos", "ewma",
    # quantiles/means of events.value (>= 0.01) and their abs errors
    "med", "p90", "mean", "sk_med", "sk_p90", "exact_med",
    "exact_p90", "err_med", "err_p90",
    # differences of same-quantum values (2-dp money, 0.5-quantum
    # medians): |v| >= half a quantum or exactly +0.0 (IEEE a-a),
    # never in the (-halfulp, 0) signed-zero window
    "dev", "mad",
    # boolean equality of two rounds — no float ships
    "sketch_merge_ok",
    # non-negative statistics: LSH candidate probability in (0,1)
    # (lsh_plan), Rayleigh quotient of a PSD Gram (embed_pca),
    # G-test statistic >= 0 (tokens_colloc_llr)
    "p_candidate", "eigval", "g2",
}


def _split_top_level(fs):
    d, cur, items = 0, "", []
    for ch in fs:
        if ch == "(":
            d += 1
        if ch == ")":
            d -= 1
        if ch == "," and d == 0:
            items.append(cur)
            cur = ""
        else:
            cur += ch
    items.append(cur)
    return items


def _cast_open_at(item, pos):
    """True if a CAST( opened before pos is still open AT pos (the
    round result never ships as a double)."""
    pre = item[:pos]
    for wm in re.finditer(r"CAST\s*\(", pre, re.I):
        d = 0
        for ch in pre[wm.end() - 1:]:
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
        if d > 0:
            return True
    return False


LIST_PRODUCERS = re.compile(
    r"^\s*(\[|list_transform\s*\(|list\s*\(|list_sort\s*\(|"
    r"list_concat\s*\(|list_prepend\s*\(|list_append\s*\(|"
    r"array_agg\s*\(|list_distinct\s*\(|range\s*\(|"
    r"generate_series\s*\(|string_split\s*\(|map\s*\{|\{')", re.I)

# lint the ASSEMBLED oracles (tools/oracles.json, written by
# `sbt "runMain graft.DumpOracles"`): oracles are composed from CTE
# fragment strings, so scanning raw triple-quoted literals would
# mis-read a fragment's SELECT as a final select. The dump must be
# regenerated whenever the registry changes — the key-set guard
# below turns a stale dump into a failure, not a silent skip.
import json
ORACLES = ROOT / "tools/oracles.json"
round_bad, array_bad = [], []
dumped = json.loads(ORACLES.read_text()) if ORACLES.exists() else None
if dumped is None:
    failures.append("tools/oracles.json missing — run "
                    "`sbt \"runMain graft.DumpOracles\"`")
elif set(dumped) != okeys:
    failures.append(
        f"tools/oracles.json is STALE (keys differ from SparkEntry."
        f"oracleSql by {sorted(set(dumped) ^ okeys)[:6]}...) — rerun "
        f"`sbt \"runMain graft.DumpOracles\"`")
for sql in (dumped or {}).values():
    fs = _final_select(sql)
    if not fs:
        continue
    for it in _split_top_level(fs):
        its = it.strip()
        am = re.search(r"\bAS\s+(\w+)\s*$", its, re.I)
        alias = am.group(1) if am else its[:40]
        # array/map/struct at the top of a final-select item: the
        # driver's pandas row-sort cannot hash ndarray cells (the
        # r10 multimodal_manifest incident) — only scalars may ship
        if LIST_PRODUCERS.match(its):
            array_bad.append(alias)
        # inspect EVERY round( in the item, not just the first — a
        # CAST-wrapped round must not shadow a later bare one, and a
        # round is only "compared, never shipped" when the NEAREST
        # preceding CASE keyword is WHEN (THEN/ELSE position ships)
        flagged = False
        for rm in re.finditer(r"(?<![A-Za-z_])round\s*\(", its, re.I):
            if _cast_open_at(its, rm.start()):
                continue
            kws = re.findall(r"\b(WHEN|THEN|ELSE)\b", its[:rm.start()],
                             re.I)
            if kws and kws[-1].upper() == "WHEN":
                continue
            flagged = True
        if flagged and alias not in NONNEG_ROUND_ALLOW:
            round_bad.append(alias)
if round_bad:
    failures.append(
        f"bare round( double in a FINAL select with un-audited alias "
        f"(signed-zero typed-hash exposure — ship a fixed-point BIGINT "
        f"or, after auditing non-negativity, extend "
        f"NONNEG_ROUND_ALLOW): {sorted(set(round_bad))}")
if array_bad:
    failures.append(
        f"array/map-typed FINAL select item (driver's pandas row-sort "
        f"cannot hash ndarray cells — ship scalars/long form): "
        f"{sorted(set(array_bad))}")

checked = len(re.findall(r"^- \[x\]", sec2, re.M))
print(f"survey_check: {len(qkeys)} query keys, {len(okeys)} oracles, "
      f"{checked} [x] rows in §2")
if failures:
    for f in failures:
        print("DRIFT:", f)
    sys.exit(1)
print("survey_check OK")
