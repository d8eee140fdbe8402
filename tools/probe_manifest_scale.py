import os, sys, time, shutil
sys.path.insert(0, '/root/repo')
from vectorsearchutil_spark.session import get_spark
from vectorsearchutil_spark.sources.manifest import ManifestLog

spark = get_spark("manifest-probe")
spark.sparkContext.setLogLevel("ERROR")
base = "/tmp/manifest_probe"
shutil.rmtree(base, ignore_errors=True)
log = ManifestLog(base)

t0 = time.time()
for i in range(200):
    batch = spark.range(i * 5000, (i + 1) * 5000).selectExpr(
        "id", "id * 2 AS v")
    log.write_and_commit(batch, mode="append")
t_commits = time.time() - t0

t0 = time.time()
n = log.read(spark).count()
t_read_frag = time.time() - t0

t0 = time.time()
log.compact(spark, target_files=32)
t_compact = time.time() - t0

t0 = time.time()
n2 = log.read(spark).count()
t_read_compact = time.time() - t0

removed = log.vacuum(keep_versions=1)
print(f"200 append commits (5k rows each): {t_commits:.1f}s total "
      f"({t_commits/200*1000:.0f} ms/commit)")
print(f"read @ 200-dir fragmentation: {t_read_frag:.2f}s -> {n} rows")
print(f"compact(target_files=32): {t_compact:.1f}s")
print(f"read after compaction: {t_read_compact:.2f}s -> {n2} rows")
print(f"vacuum removed {len(removed)} obsolete dirs")
assert n == n2 == 1_000_000
