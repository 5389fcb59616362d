"""Stateful streaming sessionization: state must survive micro-batch
boundaries — final per-user counts equal the batch computation."""

import os

from pyspark.sql import functions as F
from pyspark.sql import Window

from hoopstat_haus_spark.operators.common import load
from hoopstat_haus_spark.streaming.sessionize import (
    session_counts_batch,
    stream_session_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_state_spans_microbatches(spark, tmp_path):
    # split events into 3 time-ordered files → 3 micro-batches
    src = str(tmp_path / "src")
    os.makedirs(src)
    e = load(spark, SF, "events")
    ep = F.col("ts").cast("timestamp").cast("long")
    c1, c2 = e.agg(
        F.percentile(ep, F.lit(1.0 / 3)).alias("a"), F.percentile(ep, F.lit(2.0 / 3)).alias("b")
    ).collect()[0]
    cut1, cut2 = F.from_unixtime(F.lit(c1)).cast("timestamp_ntz"), F.from_unixtime(F.lit(c2)).cast(
        "timestamp_ntz"
    )
    parts = [
        e.filter(F.col("ts") <= cut1),
        e.filter((F.col("ts") > cut1) & (F.col("ts") <= cut2)),
        e.filter(F.col("ts") > cut2),
    ]
    import time as _time

    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"stage{i}"))
        src_file = [f for f in os.listdir(tmp_path / f"stage{i}") if f.endswith(".parquet")][0]
        os.rename(tmp_path / f"stage{i}" / src_file, f"{src}/{i:02d}.parquet")
        _time.sleep(1.1)  # distinct mtimes → deterministic file order

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_session_counts(spark, src, ckpt, out)
    q.awaitTermination(240)

    res = spark.read.parquet(out)
    assert res.select("batch_id").distinct().count() == 3  # state crossed 3 batches
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    final = (
        res.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in session_counts_batch(spark, SF).collect())
    assert got == want
