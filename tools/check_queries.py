"""Spot-check named registry queries against their oracles (drive_full's
compare, but only for the names given on argv). Usage:
    python tools/check_queries.py [--sf DIR] name [name ...]
"""
import os, sys, math, time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb

args = sys.argv[1:]
SF = "/root/testdata/sf0.001"
if args and args[0] == "--sf":
    SF = args[1]; args = args[2:]

from recommendation_system_big_data_spark.registry import registry

spark = (SparkSession.builder.master("local[8]").appName("check")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if hasattr(v, "item"): return norm(v.item())
    return v

R = registry()
fails = []
for name in args:
    qd = R[name]; t0 = time.time()
    try:
        sdf = qd.fn(spark, SF)
        if qd.oracle:
            srows = sorted([tuple(norm(v) for v in r) for r in sdf.collect()], key=repr)
            res = con.execute(qd.oracle)
            dcols = [d[0] for d in res.description]
            idx = [dcols.index(c) for c in sdf.columns]
            drows = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=repr)
            ok = srows == drows
            if not ok:
                fails.append(name)
                sonly = [r for r in srows if r not in drows][:3]
                donly = [r for r in drows if r not in srows][:3]
                print(f"FAIL {name} spark={len(srows)} duck={len(drows)}")
                print("  spark-only:", sonly)
                print("  duck-only :", donly)
            else:
                print(f"OK   {name} {len(srows)} rows {time.time()-t0:.1f}s")
        else:
            print(f"ROWS {name} {sdf.count()} {time.time()-t0:.1f}s")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {e}")
print("FAILS:", fails or "none")
spark.stop()
sys.exit(1 if fails else 0)
