import sys
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E
import duckdb, pandas as pd, numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(df):
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) and df[c].dtype != np.uint64:
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)

qs = E.queries()
sqls = E.oracle_sql()
bad = []
for name, sql in sqls.items():
    try:
        res = qs[name](SF)
        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
        elif isinstance(res, pa.Table):
            res = res.to_pandas()
        a = canon(res)
        b = canon(con.execute(sql).df())
        ok = (len(a) == len(b) and list(a.columns) == list(b.columns)
              and a.equals(b))
        if not ok:
            bad.append(name)
            print("FAIL", name, len(a), len(b), list(a.columns), list(b.columns))
    except Exception as ex:
        bad.append(name)
        print("ERROR", name, type(ex).__name__, str(ex)[:150])
print("checked", len(sqls), "failures", len(bad), bad)
ray.shutdown()

# Usage: env -u PYTHONPATH python tools/driver_replica.py
# Strict local replica of the graft driver's correctness gate at sf0.01:
# every oracle_sql() query runs on Ray AND DuckDB; rows, sorted columns,
# dtypes and values must all match (stricter than the pytest canon, which
# tolerates HUGEINT->object drift).
