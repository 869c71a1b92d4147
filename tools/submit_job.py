"""spark-submit entry point: the flagship streaming CEP chain, deployable with

    spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/pipeflow_spark_pyfiles.zip \
        tools/submit_job.py <src_dir> <out_dir> <ckpt_dir>

(`tools/spark_submit_demo.sh` packages the zip, starts the standalone cluster
and runs this end-to-end.)  On a real cluster the same command line works
unchanged against the cluster master URL — the engine is pure PySpark, no
native deps (the north rule's deployment model)."""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pipeflow_spark.operators import text
from pipeflow_spark.streaming import ExactlyOnceSink, StreamingPipeline


def main() -> None:
    src, out, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = SparkSession.builder.appName("pipeflow_submit_demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    c = F.col("text")
    sp = (
        StreamingPipeline.read_transcripts(spark, src, max_files_per_trigger=2)
        .add_column("n_tokens", text.token_count(c))
        .add_column("fp", text.fingerprint(c))
        .with_watermark("ts", "10 minutes")
        .dedupe_within_watermark(["conv_id", "turn_idx"])
        .tumbling_agg(
            "ts",
            "5 minutes",
            ["conv_id"],
            F.count("*").alias("n_turns"),
            F.sum("n_tokens").alias("tok_total"),
            F.max("turn_idx").alias("max_turn"),
        )
        .select(F.col("w.start").alias("ws"), "conv_id", "n_turns", "tok_total", "max_turn")
    )
    sink = ExactlyOnceSink(out)
    q = sp.start_exactly_once(sink, ckpt, output_mode="append")
    q.awaitTermination()
    print(f"SUBMIT_OK committed_batches={len(sink.committed_batches())} rows={sum(m['rows'] for m in sink.metrics())}")
    spark.stop()


if __name__ == "__main__":
    main()
