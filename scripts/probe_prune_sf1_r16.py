import os, sys, time, json
import numpy as np
repo = sys.argv[1]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
from tape_spark.analysis import calc_stetson_J

SF = "/root/repo/.benchdata/sf1"
def _noop(batches):
    for b in batches:
        yield b
spark.range(128, numPartitions=32).mapInPandas(_noop, "id long").count()
df = spark.read.parquet(f"{SF}/lineitem.parquet")
df.agg(*[F.count(c) for c in df.columns]).collect()

walls9, walls2, cal = [], [], []
for _ in range(5):
    e = em._ensemble(spark, SF); e.prune(threshold=5)
    t0 = time.time(); e.batch(calc_stetson_J).count(); walls9.append(round(time.time()-t0, 3))
    e = em._ensemble(spark, SF); e.prune(threshold=5)
    t0 = time.time(); e.source.limit(5).collect(); walls2.append(round(time.time()-t0, 3))
    t0 = time.time(); spark.range(50_000_000, numPartitions=32).agg(F.sum("id")).collect(); cal.append(round(time.time()-t0, 3))
print(json.dumps({"repo": repo, "q9_sf1": walls9, "q9min": min(walls9),
                  "q2_sf1": walls2, "q2min": min(walls2), "cal": cal}))
spark.stop()
