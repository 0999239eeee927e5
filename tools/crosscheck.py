import duckdb, json, glob, os, sys
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv)>1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv)>2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    files = glob.glob(f"{pdir}/*.parquet")
    spark_df = pq.read_table(files).to_pandas()
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails.append(name); continue
    # normalize: sort columns by name, sort rows by all columns, reset index
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
        return df
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(s.columns)} duck={list(d.columns)}"); fails.append(name); continue
    if len(s) != len(d):
        print(f"{name}: ROWCOUNT spark={len(s)} duck={len(d)}"); fails.append(name); continue
    # compare values as strings to dodge dtype quibbles, but note dtype diffs
    eq = True
    for c in s.columns:
        sv = s[c].astype(str); dv = d[c].astype(str)
        if not (sv == dv).all():
            bad = (~(sv==dv)).idxmax()
            print(f"{name}: VALUE MISMATCH col={c} row {bad}: spark={sv[bad]!r} duck={dv[bad]!r} (sparktype={s[c].dtype}, ducktype={d[c].dtype})")
            eq = False; break
    if eq:
        dt_s = {c: str(s[c].dtype) for c in s.columns}
        dt_d = {c: str(d[c].dtype) for c in d.columns}
        tstr = "" if dt_s == dt_d else f"  [dtype diff: {[(c,dt_s[c],dt_d[c]) for c in s.columns if dt_s[c]!=dt_d[c]]}]"
        print(f"{name}: OK rows={len(s)}{tstr}")
    else:
        fails.append(name)
print("\nFAILED:", fails if fails else "none")

# Usage: python3 tools/crosscheck.py [sfDir] [verifyOutDir]
# Replays the driver's correctness gate locally: registers the testdata
# parquet tables as DuckDB views, runs every SparkEntry.oracleSql, and
# compares value-exactly (sorted columns + rows) against the parquet
# written by `sbt "runMain graft.Verify <sfDir> <outDir>"`.
