"""Time the 10 heaviest registry entries + the corpus pipeline at a
given SF dir (sf2.0/sf4.0 octaves), one warm + one timed run each."""
import sys, time, json, tempfile, shutil
sys.path.insert(0, "/root/repo")
from redshift_to_lakehouse_migration_spark.queries import QUERIES
from redshift_to_lakehouse_migration_spark.session import get_spark

HEAVY = ["knn_ivfpq_refined", "knn_ivfpq", "knn_pq_adc", "kmeans_clusters",
         "price_percentiles", "dedup_minhash_lsh", "market_basket_pairs",
         "knn_ivf", "corpus_funnel", "dedup_clusters"]

if len(sys.argv) < 2:
    print("usage: python tools/heavy_scale_probe.py <sf_dir>")
    raise SystemExit(2)
sf_dir = sys.argv[1]
spark = get_spark("heavy_probe")
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {}
for name in HEAVY:
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 2)

from redshift_to_lakehouse_migration_spark.llm.pipeline import run_corpus_pipeline
from redshift_to_lakehouse_migration_spark.tables import load, spread
docs = spread(load(spark, sf_dir, "documents"), spark)
tmp = tempfile.mkdtemp(prefix="corpus_scale_")
try:
    t0 = time.perf_counter()
    run_corpus_pipeline(spark, docs, tmp).write.format("noop").mode("overwrite").save()
    out["corpus_prep_pipeline"] = round(time.perf_counter() - t0, 2)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({"sf_dir": sf_dir, "timings": out}))
spark.stop()
