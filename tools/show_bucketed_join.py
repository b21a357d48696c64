"""Demonstrate the 100 TB fetch-join layout: both the frontier batch and the
payload table bucketed on image_id → SortMergeJoin with ZERO exchanges
(verified output: "exchanges in bucketed join: 0").

Run standalone (own SparkSession config): python tools/show_bucketed_join.py
"""

import contextlib
import io
import shutil
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    from pyspark.sql import SparkSession

    from archive_query_log_spark.crawler import synth

    d = tempfile.mkdtemp(prefix="bucketed_")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bucketed-join-demo")
        .config("spark.sql.warehouse.dir", d)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    images = synth.synth_images(spark, 2000, 8)
    sched = synth.synth_frontier(spark, 10000, 2000, 8).select(
        "id", "image_id", "url_key", "host"
    )
    images.write.bucketBy(16, "image_id").sortBy("image_id").mode(
        "overwrite"
    ).saveAsTable("images_b")
    sched.write.bucketBy(16, "image_id").mode("overwrite").saveAsTable("sched_b")
    j = spark.table("sched_b").join(spark.table("images_b"), "image_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    n_ex = sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and "Exchange" in line
    )
    print("exchanges in bucketed join:", n_ex)
    print("rows:", j.count())
    spark.stop()
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
