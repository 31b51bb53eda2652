#!/usr/bin/env python
"""Round-6 merge phase profiler: runs the bench-shaped cold merge with the
Spark UI REST API enabled and prints the per-job timeline, attributed to
the setJobDescription phase labels merge_into now carries (guide §1.5).
Evidence source for OPTIMIZATION_r06.md; not part of the frozen bench."""
import os, sys, time, json, urllib.request, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ecommerce_lakehouse_spark.session import get_spark, warm_python_workers
from ecommerce_lakehouse_spark.datagen import generate_pages, generate_recrawl_delta
from ecommerce_lakehouse_spark.operators.merge import dedup_latest, merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable
CPUS=32; N=60000
spark = get_spark("mr", cores=CPUS, shuffle_partitions=CPUS,
                  extra_conf={"spark.ui.enabled":"true","spark.ui.port":"4079"})
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark, CPUS)
app = spark.sparkContext.applicationId
work = tempfile.mkdtemp(prefix="mr-")
tbl = IcehouseTable.create(spark, f"{work}/pages", generate_pages(spark, N, seed=42, partitions=CPUS*2))
raw = dedup_latest(generate_recrawl_delta(spark, N, n_new=N//10, n_recrawl=N//5, seed=42, partitions=CPUS), ["url"], "warc_ts")
raw.write.mode("overwrite").parquet(f"{work}/delta")
delta = spark.read.parquet(f"{work}/delta")
t0=time.time(); res = merge_into(tbl, delta, "url", target_file_rows=N//CPUS)
wall=time.time()-t0
url=f"http://localhost:4079/api/v1/applications/{app}/jobs"
jobs=sorted(json.load(urllib.request.urlopen(url)), key=lambda j:j["jobId"])
print(f"merge={wall:.3f} files_rewritten={res.files_rewritten} discovery={tbl.current_snapshot().summary.get('merge_discovery')}")
for j in jobs[-12:]:
    print(f"  job {j['jobId']} {j.get('submissionTime','?')[-12:]}..{j.get('completionTime','?')[-12:]} tasks={j['numCompletedTasks']} desc={(j.get('description') or j['name'])[:60]}")
import shutil; shutil.rmtree(work, ignore_errors=True)
