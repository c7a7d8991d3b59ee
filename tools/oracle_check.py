import duckdb, json, sys, glob, math
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(val):
    if val is None: return None
    if isinstance(val, float):
        if math.isnan(val): return 'NaN'
        return repr(val)
    if isinstance(val, bool): return repr(val)
    try:
        import decimal
        if isinstance(val, decimal.Decimal):
            return str(val.normalize())
    except Exception: pass
    return str(val)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_files = glob.glob(f'{outdir}/{name}/*.parquet')
        sdf = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
        scols = [d[0] for d in con.sql(f"SELECT * FROM read_parquet({spark_files!r}) LIMIT 0").description]
        ddf_rel = con.sql(sql)
        dcols = [d[0] for d in ddf_rel.description]
        ddf = ddf_rel.fetchall()
        # sort columns by name (driver behavior), canonicalize values, sort rows
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        if sorted(scols) != sorted(dcols):
            fails.append((name, f'COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}'))
            continue
        srows = sorted(tuple(canon(r[i]) for i in sidx) for r in sdf)
        drows = sorted(tuple(canon(r[i]) for i in didx) for r in ddf)
        if len(srows) != len(drows):
            fails.append((name, f'ROWCOUNT spark={len(srows)} duck={len(drows)}'))
            continue
        bad = [(a, b) for a, b in zip(srows, drows) if a != b]
        if bad:
            fails.append((name, f'{len(bad)} differing rows; first: spark={bad[0][0]} duck={bad[0][1]}'))
        else:
            print(f'OK   {name} ({len(srows)} rows)')
    except Exception as e:
        fails.append((name, f'ERROR {type(e).__name__}: {e}'))

for name, msg in fails:
    print(f'FAIL {name}: {msg}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} queries match')
