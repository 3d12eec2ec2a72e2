#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare (dev tool only;
the shipped engine is pure Scala/Spark)."""
import duckdb, json, glob, sys
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_r1'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f'{out}/{name}/*.parquet'))
    if not files:
        print(f"{name}: NO OUTPUT"); fails += 1; continue
    s = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        d = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    s = s[sorted(s.columns)]; d = d[sorted(d.columns)]
    if list(s.columns) != list(d.columns):
        print(f"{name}: COLS {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"{name}: ROWS {len(s)} vs {len(d)}"); fails += 1; continue
    # Dtype-strict, mirroring the driver's type-sensitive hash. The driver
    # unifies integer widths (int32 row_number vs DuckDB BIGINT passes:
    # q20/q24 in CORRECTNESS_r03) but NOT kind — a DuckDB HUGEINT reaches
    # pandas as float64/object and must fail here exactly like it fails
    # there (q85 in r3). So: ints→int64, float32→float64, datetime→us;
    # int-vs-float and object stay strict.
    for df in (s, d):
        for c in df.columns:
            dt = df[c].dtype
            if pd.api.types.is_datetime64_any_dtype(dt):
                df[c] = df[c].astype('datetime64[us]')
            elif pd.api.types.is_integer_dtype(dt):
                df[c] = df[c].astype('int64')
            elif str(dt) == 'float32':
                df[c] = df[c].astype('float64')
    sd = [str(s[c].dtype) for c in s.columns]
    dd = [str(d[c].dtype) for c in d.columns]
    if sd != dd:
        bad = [(c, a, b) for c, a, b in zip(s.columns, sd, dd) if a != b]
        print(f"{name}: DTYPE {bad}"); fails += 1; continue
    try:
        pd.testing.assert_frame_equal(s.reset_index(drop=True), d.reset_index(drop=True), check_dtype=True)
        print(f"{name}: OK ({len(s)} rows)")
    except Exception as e:
        print(f"{name}: VALUES MISMATCH"); print('   ', str(e).split(chr(10))[:6]); fails += 1
print(f"\n{'ALL GREEN' if fails==0 else str(fails)+' FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
