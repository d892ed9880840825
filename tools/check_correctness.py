#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same sf dir and compare
row count, sorted-column schema, and a value hash. Dev tool only."""
import sys, json, glob, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def norm(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

results = {}
for name, sql in sorted(oracle.items()):
    d = f"{out_dir}/{name}"
    entry = {}
    try:
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            raise FileNotFoundError(f"no parquet under {d}")
        rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
        spark_cols = [c[0] for c in rel.description]
        spark_rows = rel.fetchall()
        # The driver's checker formats int128 differently from plain ints, so
        # any HUGEINT oracle column (bare SUM(), list_sum, ...) hash-diverges
        # even when values match. Fail loudly here so the trap dies locally.
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
        if bad:
            raise ValueError(
                f"oracle emits unstable-format column(s) {bad}; "
                "wrap in CAST(... AS BIGINT)")
        orel = con.execute(sql)
        o_cols = [c[0] for c in orel.description]
        o_rows = orel.fetchall()
        entry["rows"] = (len(spark_rows), len(o_rows))
        entry["schema_match"] = sorted(spark_cols) == sorted(o_cols)
        if not entry["schema_match"]:
            entry["spark_cols"] = sorted(spark_cols)
            entry["oracle_cols"] = sorted(o_cols)
        entry["hash_match"] = (
            entry["schema_match"]
            and table_hash(spark_rows, spark_cols) == table_hash(o_rows, o_cols)
        )
    except Exception as e:
        entry["error"] = str(e)[:300]
    results[name] = entry

ok = sum(1 for e in results.values() if e.get("hash_match"))
for name, e in results.items():
    status = "OK " if e.get("hash_match") else "FAIL"
    print(f"{status} {name}: {json.dumps(e)[:240]}")
print(f"\n{ok}/{len(results)} hash-match")
