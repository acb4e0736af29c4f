"""Stage-metrics profiler: runs the bench phases with the Spark UI REST API
on, then dumps per-stage executorRunTime / GC / shuffle / python metrics.

Usage: python scripts/profile_stages.py <cores> [turns]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
turns = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName("stageprof")
    .config("spark.sql.shuffle.partitions", str(max(cores * 4, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "true")
    .getOrCreate()
)
sc = spark.sparkContext
app_id = sc.applicationId
ui = "http://localhost:4040"

import bench  # noqa: E402
from news_information_retrieval_system_spark.index.build import build_index  # noqa: E402
from news_information_retrieval_system_spark.index.segments import build_blocked_postings  # noqa: E402
from news_information_retrieval_system_spark.query.bm25 import bm25_topk, query_terms_df  # noqa: E402
from news_information_retrieval_system_spark.query.wand import wand_topk  # noqa: E402

path = bench.ensure_corpus(spark, turns)
docs = spark.read.parquet(path).select("doc_id", "text")

phases: dict[str, tuple[float, list[int]]] = {}


def run_phase(name: str, fn):
    jobs_before = {j["jobId"] for j in api("jobs")}
    t0 = time.time()
    fn()
    dt = time.time() - t0
    jobs = [j for j in api("jobs") if j["jobId"] not in jobs_before]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    phases[name] = (dt, stage_ids)
    print(f"--- {name}: {dt:.2f}s (stages {stage_ids})", flush=True)


def api(what: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{what}") as r:
        return json.load(r)


idx = build_index(docs)
run_phase("build_flat", lambda: (idx.postings.persist().count(), idx.term_stats.persist().count()))
blk = build_blocked_postings(idx.postings).persist()
run_phase("build_blocked", lambda: blk.count())
qdf = query_terms_df(spark, bench.bench_queries()).persist()
qdf.count()
n_docs, avgdl = idx.scalar_stats()
qidf = qdf.join(idx.term_stats.select("term", "idf"), "term").persist()
qidf.count()
run_phase("bm25_batch", lambda: bm25_topk(idx, qdf, k=10).count())
run_phase("wand_batch", lambda: wand_topk(blk, qidf, n_docs, avgdl, k=10).count())

print("\n===== stage detail =====")
stages = {s["stageId"]: s for s in api("stages") if s["status"] == "COMPLETE"}
for name, (dt, sids) in phases.items():
    print(f"\n## {name}: wall {dt:.2f}s")
    for sid in sids:
        s = stages.get(sid)
        if not s:
            continue
        ms = lambda k: s.get(k, 0) / 1000.0
        print(
            f"  stage {sid:3d} tasks={s['numCompleteTasks']:4d} "
            f"run={ms('executorRunTime'):7.1f}s cpu={s.get('executorCpuTime',0)/1e9:7.1f}s "
            f"gc={ms('jvmGcTime'):5.1f}s "
            f"deser={ms('executorDeserializeTime'):5.1f}s "
            f"shW={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB shR={s.get('shuffleReadBytes',0)/1e6:8.1f}MB "
            f"spill={s.get('diskBytesSpilled',0)/1e6:6.1f}MB "
            f"| {s.get('name','')[:60]}"
        )
spark.stop()
