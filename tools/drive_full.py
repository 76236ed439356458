"""Complete driver simulation: every queries() entry under a vanilla
SparkSession at sf0.01 — oracle-diffed when oracle_sql has it, rows-only
otherwise. This is exactly the driver's t2 pass."""
import os, sys, math, time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession
import duckdb

spark = (SparkSession.builder.master("local[16]").appName("driver-full")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if hasattr(v, "item"): return norm(v.item())
    return v

qs, oracles = E.queries(), E.oracle_sql()
fails, t_start = [], time.time()
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        if name in oracles:
            srows = sorted([tuple(norm(v) for v in r) for r in sdf.collect()], key=repr)
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            idx = [dcols.index(c) for c in sdf.columns]
            drows = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=repr)
            ok = srows == drows
            status = "OK " if ok else "HASH-FAIL"
            detail = f"{len(srows)}/{len(drows)}"
            if not ok: fails.append(name)
        else:
            n = sdf.count()
            status, detail = "ROWS", str(n)
    except Exception as e:
        status, detail = "ERROR", str(e)[:100]
        fails.append(name)
    print(f"{status} {name} {detail} {time.time()-t0:.1f}s", flush=True)
print(f"TOTAL {time.time()-t_start:.0f}s FAILS: {fails or 'none'}")
# Recorded evidence that the local gate ran at the DRIVER's scale factor
# (VERDICT r6 #4): one JSON line per completed sweep, committed with the
# round's work so scale-dependent seams can't hide between local sf0.001
# tests and the driver's sf0.01 window.
import json, subprocess
try:
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
except Exception:
    head = "unknown"
with open(os.path.join(REPO, "SWEEPS.jsonl"), "a") as fh:
    fh.write(json.dumps({
        "ts": time.time(), "sf": SF, "n_queries": len(qs),
        "n_oracle": sum(1 for n in qs if n in oracles),
        "fails": fails, "wall_s": round(time.time() - t_start, 1),
        "head": head,
    }) + "\n")
spark.stop()
sys.exit(1 if fails else 0)
