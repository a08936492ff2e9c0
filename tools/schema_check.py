#!/usr/bin/env python3
"""Detect driver-side testdata schema drift.

The round driver regenerates /root/testdata between rounds and has
changed column types across builds (events.ts went TIMESTAMP(NANOS) ->
TIMESTAMP_NTZ micros at the start of round 8, silently breaking every
`ts div 1e9` expression). Run this at session start: it dumps every
table's schema and diffs it against the expected manifest below.

Exit 0 = no drift; exit 1 = drift (each difference printed). A type
listed as a set means any member is accepted (the Tables.load
normalization seam handles those flavors).
"""
import sys
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string",
               "n_regionkey": "int32"},
    "customer": {"c_custkey": "int64", "c_name": "string",
                 "c_nationkey": "int32", "c_acctbal": "double",
                 "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "int64", "s_name": "string",
                 "s_nationkey": "int32", "s_acctbal": "double"},
    "part": {"p_partkey": "int64", "p_name": "string", "p_brand": "string",
             "p_type": "string", "p_size": "int32",
             "p_retailprice": "double"},
    "orders": {"o_orderkey": "int64", "o_custkey": "int64",
               "o_orderstatus": "string", "o_totalprice": "double",
               "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
               "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "int64", "l_partkey": "int64",
                 "l_suppkey": "int64", "l_linenumber": "int32",
                 "l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_tax": "double",
                 "l_returnflag": "string", "l_linestatus": "string",
                 "l_shipdate": {"timestamp[us]", "timestamp[ns]"}},
    # ts accepted in every flavor Tables.normalizeEventTs handles.
    # The int64 (raw nanos) flavor is ALSO oracle-compatible now:
    # gate.py rewrites the DuckDB events view to
    # make_timestamp(ts // 1000) when it sees int64, matching the
    # Spark-side normalization (epoch_us/epoch would error on BIGINT)
    "events": {"event_id": "int64",
               "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
               "user_id": "int64", "event_type": "string",
               "value": "double", "props": "string"},
    "documents": {"doc_id": "int64", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "int64"},
    "embeddings": {"vec_id": "int64",
                   "embedding": "list<element: float>", "label": "int32"},
}

drift = []
for table, cols in EXPECTED.items():
    try:
        schema = pq.read_schema(f"{SF}/{table}.parquet")
    except Exception as e:
        drift.append(f"{table}: unreadable ({e})")
        continue
    actual = {f.name: str(f.type) for f in schema}
    for name, want in cols.items():
        got = actual.pop(name, None)
        ok = got in want if isinstance(want, set) else got == want
        if not ok:
            drift.append(f"{table}.{name}: expected {want}, got {got}")
    for name, got in actual.items():
        drift.append(f"{table}.{name}: unexpected new column ({got})")

if drift:
    print(f"SCHEMA DRIFT in {SF}:")
    for d in drift:
        print("  " + d)
    sys.exit(1)
print(f"schemas OK in {SF}")
