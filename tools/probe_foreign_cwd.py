# Probe every Python-row-path query under the WORST driver conditions:
# vanilla session, cwd=/tmp, package only on driver sys.path.
import os, sys
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
os.chdir("/tmp")
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("cwd-probe")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as E
qs = E.queries()
SF = "/root/testdata/sf0.01"
for name in ["multimodal_decode", "multimodal_resize", "multimodal_frame_sample",
             "stream_stateful_user_stats", "fn_pandas_udf_vectorized", "grouped_pandas_slope",
             "fn_map_in_arrow", "fn_pandas_udf_iterator", "cogrouped_pandas_ratio",
             "fn_python_udtf", "scan_python_datasource", "fn_pandas_udaf_grouped",
             "fn_arrow_python_udf", "fn_udtf_table_arg",
             "stream_rolling_anomaly",
             # round-6 Python paths: the PQ assignment mapInPandas factory
             # (three consumers) and the PAV applyInPandas factory
             "embedding_pq_compress", "sim_topk_pq_adc", "sim_topk_ivfpq",
             "ml_isotonic_calibration", "ts_holt_linear", "sink_python_datasource", "fn_udtf_dynamic_schema",
             # round-10 Python paths: the Holt-Winters applyInPandas
             # factory and the zlib compressibility mapInPandas factory
             "ts_holt_winters_seasonal", "text_compression_ratio",
             # round-14 Python path: the Croston applyInPandas factory
             "ts_forecast_croston", "ts_theta_forecast"]:
    try:
        n = qs[name](spark, SF).count()
        print("OK", name, n)
    except Exception as e:
        print("ERROR", name, str(e)[:120].replace("\n", " "))
spark.stop()
