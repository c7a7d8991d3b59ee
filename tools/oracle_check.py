import duckdb, json, sys, glob

# Strict local mimic of the driver's oracle compare. Round-1 lesson: the
# driver's hash is sensitive to declared output TYPES (decimal precision/
# scale, timestamp tz-adjustment), not just rendered values — so this
# harness compares (a) DuckDB-described column types of the Spark parquet
# vs the oracle relation, and (b) exact value renderings with NO decimal
# normalization. Local green must predict driver green.

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(val):
    import math, datetime
    if val is None: return None
    if isinstance(val, float):
        if math.isnan(val): return 'NaN'
        return repr(val)
    if isinstance(val, bool): return repr(val)
    if isinstance(val, datetime.datetime):
        return val.isoformat()  # keeps tzinfo difference visible
    return str(val)  # Decimal: exact scale-preserving rendering, no normalize()

def described_types(rel_sql):
    rows = con.sql(f"DESCRIBE {rel_sql}").fetchall()
    return {r[0]: r[1] for r in rows}

fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_files = glob.glob(f'{outdir}/{name}/*.parquet')
        spark_rel = f"SELECT * FROM read_parquet({spark_files!r})"
        sdf = con.sql(spark_rel).fetchall()
        stypes = described_types(spark_rel)
        dtypes = described_types(f"({sql})")
        ddf = con.sql(sql).fetchall()
        scols, dcols = list(stypes), list(dtypes)
        if sorted(scols) != sorted(dcols):
            fails.append((name, f'COLUMN MISMATCH spark={sorted(scols)} duck={sorted(dcols)}'))
            continue
        tdiff = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
        if tdiff:
            fails.append((name, f'TYPE MISMATCH {tdiff}'))
            continue
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
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
