#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each spark result
parquet against DuckDB executing the oracle SQL on the same fixtures.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import duckdb, json, sys, glob

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def norm(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith('datetime'):
            df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
        elif dt.startswith('float'):
            df[c] = df[c].astype('float64')
        elif dt.startswith('int') or dt.startswith('uint'):
            df[c] = df[c].astype('int64')
        elif dt == 'object':
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    declared = set(glob.glob(f'{outdir}/*/'))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f'{outdir}/{name}/*.parquet')
        if not files:
            print(f'[MISS ] {name}: no spark output')
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f'[OERR ] {name}: {e}')
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f'[SCHEMA] {name}: oracle={sorted(odf.columns)} '
                  f'spark={sorted(sdf.columns)}')
            n_fail += 1
            continue
        o, s = norm(odf), norm(sdf)
        if len(o) != len(s):
            print(f'[ROWS ] {name}: oracle={len(o)} spark={len(s)}')
            n_fail += 1
            continue
        if o.equals(s):
            print(f'[ok   ] {name} ({len(o)} rows)')
            n_pass += 1
        else:
            neq = (o != s) & ~(o.isna() & s.isna())
            bad = neq.any(axis=1)
            print(f'[DIFF ] {name}: {bad.sum()}/{len(o)} rows differ; first:')
            print('  oracle:', o[bad].head(2).to_dict('records'))
            print('  spark :', s[bad].head(2).to_dict('records'))
            n_fail += 1
    extra = {d.rstrip('/').split('/')[-1] for d in declared} - set(oracle)
    if extra:
        print(f'[info ] spark-only (rows-only check by driver): {sorted(extra)}')
    print(f'== {n_pass} pass, {n_fail} fail ==')
    return 1 if n_fail else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
