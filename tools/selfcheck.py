#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(writes <outdir>/<name>/ parquet + oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same tables and compares values
column-sorted, exactly like the driver's hash compare (SURVEY.md §0.2).

Usage: python3 tools/selfcheck.py <sfDir> <outDir> [query ...]
"""
import sys, json, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ['region','nation','supplier','customer','part','orders',
          'lineitem','events','documents','embeddings']

def canon(v):
    # NO array/list canonicalization: the driver's comparator sorts by all
    # columns (pandas sort_values), which raises on unhashable ndarray/list
    # values — declared query outputs must not contain collection columns.
    if isinstance(v, float) and math.isnan(v):
        return 'NaN'
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype('datetime64[us]').item()
    if v is pd.NaT or v is None:
        return None
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            bad.append((name, f'ORACLE_ERR {str(e)[:300]}')); continue
        try:
            sdf = pd.read_parquet(f'{outdir}/{name}')
        except Exception as e:
            bad.append((name, f'SPARK_MISSING {str(e)[:200]}')); continue
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            bad.append((name, f'COLS spark={list(sdf.columns)} oracle={list(odf.columns)}')); continue
        if len(odf) != len(sdf):
            bad.append((name, f'NROWS spark={len(sdf)} oracle={len(odf)}')); continue
        try:
            # mirror the driver: sort rows by ALL columns before comparing
            cols = list(odf.columns)
            odf = odf.sort_values(by=cols, ignore_index=True)
            sdf = sdf.sort_values(by=cols, ignore_index=True)
        except Exception as e:
            bad.append((name, f'SORT_ERR (driver-comparator-incompatible '
                              f'column types) {str(e)[:200]}')); continue
        diff_msg = None
        for c in odf.columns:
            sv = [canon(x) for x in sdf[c].tolist()]
            ov = [canon(x) for x in odf[c].tolist()]
            if sv != ov:
                idx = next(i for i in range(len(sv)) if sv[i] != ov[i])
                diff_msg = (f'VAL col={c} row={idx} spark={sv[idx]!r} '
                            f'oracle={ov[idx]!r} '
                            f'(n_diff={sum(1 for a,b in zip(sv,ov) if a!=b)})')
                break
        if diff_msg:
            bad.append((name, diff_msg)); continue
        # Dtype gate (r12's one red row): Python compares 10275.0 ==
        # 10275 as equal, but the DRIVER's value hash is dtype-sensitive
        # — DuckDB SUM(BIGINT)→HUGEINT lands as float64 while Spark
        # emits int64, and the hash mismatches on bit-identical values.
        # An int-vs-float dtype split is therefore a HARD FAIL here
        # (cast the oracle ::BIGINT); other dtype drifts stay advisory.
        hard = [f'{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}'
                for c in odf.columns
                if (pd.api.types.is_integer_dtype(sdf[c].dtype)
                    != pd.api.types.is_integer_dtype(odf[c].dtype))
                and pd.api.types.is_numeric_dtype(sdf[c].dtype)
                and pd.api.types.is_numeric_dtype(odf[c].dtype)]
        if hard:
            bad.append((name, 'DTYPE (driver hash is dtype-sensitive; '
                              'cast the oracle) ' + ','.join(hard)))
            continue
        dts = [f'{c}:{sdf[c].dtype}!={odf[c].dtype}' for c in odf.columns
               if str(sdf[c].dtype) != str(odf[c].dtype)]
        ok.append((name, ('dtypes: ' + ','.join(dts)) if dts else ''))
    for name, note in ok:
        print(f'PASS {name}' + (f'  [{note}]' if note else ''))
    for name, msg in bad:
        print(f'FAIL {name}: {msg}')
    print(f'\n{len(ok)} pass / {len(bad)} fail')
    sys.exit(1 if bad else 0)

if __name__ == '__main__':
    main()
