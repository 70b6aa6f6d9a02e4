import duckdb, json, glob, os, sys
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['documents','embeddings','events','lineitem','orders','customer','part','supplier','nation','region']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name, sql in sorted(oracle.items()):
    d = f'{out}/{name}'
    if not os.path.isdir(d):
        results[name] = 'MISSING-SPARK'; continue
    try:
        spark_df = pq.read_table(glob.glob(f'{d}/*.parquet')[0]).to_pandas()
    except Exception as e:
        results[name] = f'SPARK-READ-FAIL {e}'; continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        results[name] = f'ORACLE-FAIL {str(e)[:200]}'; continue
    # normalize: sort columns by name, sort rows, reset index
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = f'COLS a={list(a.columns)} b={list(b.columns)}'; continue
    if len(a) != len(b):
        results[name] = f'ROWS a={len(a)} b={len(b)}'; continue
    if [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
        results[name] = f'DTYPES a={list(map(str,a.dtypes))} b={list(map(str,b.dtypes))}'
        # still check values
    try:
        eq = a.equals(b)
        if not eq:
            diff = (a != b) & ~(a.isna() & b.isna())
            nbad = int(diff.any(axis=1).sum())
            i = diff.any(axis=1).idxmax()
            results[name] = results.get(name,'') + f' VALUES {nbad} rows differ; first at {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}'
        elif name not in results:
            results[name] = f'OK ({len(a)} rows)'
    except Exception as e:
        results[name] = f'CMP-FAIL {e}'
for k, v in sorted(results.items()):
    print(f'{k:24s} {v[:400]}')
nok = sum(1 for v in results.values() if v.startswith('OK'))
print(f'--- {nok}/{len(results)} OK; spark-only (no oracle): {sorted(set(os.listdir(out)) - set(oracle.keys()) - {"oracle_sql.json"})}')
