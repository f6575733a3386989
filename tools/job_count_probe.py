import os, sys, time, json
sys.path.insert(0, sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from real_time_stock_market_data_pipeline_spark.plans import QUERIES
from real_time_stock_market_data_pipeline_spark.session import get_spark

def _force(df): df.write.format("noop").mode("overwrite").save()
def _release(spark):
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values(): rdd.unpersist()

def marker_id(spark):
    g = f"marker{time.time_ns()}"
    spark.sparkContext.setJobGroup(g, g)
    spark.range(1).count()
    jid = spark.sparkContext.statusTracker().getJobIdsForGroup(g)
    spark.sparkContext.setJobGroup(None, None)
    return max(jid)

def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jobcount")
    _force(spark.range(1000).selectExpr("sum(id) s"))
    import pandas as pd
    _force(spark.range(64).selectExpr("id % 8 g","id").groupBy("g").applyInPandas(lambda p: pd.DataFrame({"n":[len(p)]}), schema="n long"))
    for name in sys.argv[1].split(","):
        fn = QUERIES[name]
        _force(fn(spark, sf)); _release(spark)  # warm (memo fits paid)
        a = marker_id(spark)
        t0 = time.perf_counter()
        _force(fn(spark, sf))
        dt = time.perf_counter() - t0
        b = marker_id(spark)
        _release(spark)
        print(json.dumps({"name": name, "total_jobs": b - a - 1, "sec": round(dt,3)}), flush=True)

main()
# Marker-job total-job-count probe (r19): diffs Spark's global job ids
# around one warm run of each named query — counts jobs submitted from
# EVERY thread (solo_probe's per-group count misses leg-thread jobs).
# Usage: python tools/job_count_probe.py q1,q2,... [repo_root]
