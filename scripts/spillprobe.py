"""Spill/memory attribution for the q219 2M memo-level gap (one level
per process; run MD then DISK_ONLY). Warm + 2 timed trials with event
logging on; afterwards parse the event log for per-stage spill and the
RDD storage footprint.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

level = sys.argv[1]
n = 2_000_000
path = f"/tmp/spanskew_{n}"

from batch_process_spark.session import get_spark

spark = get_spark(
    f"spillprobe-{level}",
    extra_conf={
        "spark.batchprocess.spanMemoLevel": level,
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "/tmp/spark-events",
    },
)
import __spark_entry__ as entry

q = entry.queries()["q219_span_attribution"]
sc = spark.sparkContext
sc.setJobDescription(f"spill {level} warm")
t0 = time.time(); q(spark, path).write.format("noop").mode("overwrite").save()
warm = time.time() - t0
walls = []
for i in range(2):
    sc.setJobDescription(f"spill {level} trial {i}")
    t0 = time.time(); q(spark, path).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 1))

# cache footprint (storage status via JVM status tracker / RDD info)
rdd_info = []
for r in sc._jsc.sc().getRDDStorageInfo():
    rdd_info.append({
        "name": r.name(), "memSize": int(r.memSize()),
        "diskSize": int(r.diskSize()), "partitions": int(r.numCachedPartitions()),
    })
app_id = sc.applicationId
print(json.dumps({"level": level, "warm": round(warm, 1), "walls": walls,
                  "rdds": rdd_info, "app_id": app_id}))
spark.stop()
