import sys, os, time, traceback
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","12g").getOrCreate())
import __spark_entry__ as e
rows = e.entry(spark).collect(); assert rows, "entry returned 0 rows"
qs, osql = e.queries(), e.oracle_sql()
from oracle import assert_matches_oracle
bad = []
t0 = time.time()
for i, name in enumerate(sorted(osql)):
    try:
        assert_matches_oracle(qs[name](spark, SF), osql[name], SF, name)
    except Exception as ex:
        bad.append(name)
        print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
    if (i+1) % 50 == 0:
        print(f"# {i+1}/{len(osql)} done {time.time()-t0:.0f}s", flush=True)
print(f"DONE n={len(osql)} bad={len(bad)} {bad} in {time.time()-t0:.0f}s")
spark.stop()
