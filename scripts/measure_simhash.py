"""One-off: time simhash variants at sf0.1 (judge demand r4 #3)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators import similarity as S
from crawler_apple_podcast_spark.session import get_spark

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="measure", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf}/documents.parquet")
docs.count()  # warm

def timeit(name, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    print(f"{name}: {best:.3f}s")

timeit("prod (xxhash64)", lambda: S.simhash_near_pairs(S.simhash(docs, "doc_id", "text"), 3, 4))
timeit("arith (char_sum)", lambda: S.simhash_near_pairs(S.simhash_arith(docs, "doc_id", "text"), 3, 4))
