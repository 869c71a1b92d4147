"""Scaling-efficiency evidence for the north rule.

The BASELINE.json criterion — "throughput scaling efficiency >=0.8 between N
and 4N executor clusters" — cannot use a real cluster in this sandbox, so we
run the IDENTICAL streaming job (watermark -> stateful dedupe -> vectorized
text profile -> tumbling per-conv window agg -> exactly-once sink) on the
IDENTICAL seeded input at two parallelism levels, local[8] and local[32]
(N and 4N cores), in fresh JVMs, and report

    turns/sec @ 8, turns/sec @ 32, efficiency = T32 / (4 * T8)

Usage:
    python tools/bench_scaling.py            # orchestrator: runs both, prints JSON
    python tools/bench_scaling.py --run 8    # worker: one measurement (internal)

The job is the engine's flagship micro-batch CEP chain; input is sized so each
micro-batch carries enough rows (~10^5) that per-batch fixed costs (planning,
checkpoint commit) are amortized — the same reason a real 10^12-turn deployment
uses maxBytesPerTrigger to keep batches large.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "150000"))
N_FILES = 4


def build_input(work: str) -> tuple[str, int]:
    import datetime as dt

    from pipeflow_spark.streaming.transcripts import (
        synthesize_transcripts,
        write_arrival_files,
        write_sentinel_file,
    )

    src = os.path.join(work, "src")
    pdf = synthesize_transcripts(n_convs=N_CONVS, n_files=N_FILES, seed=42, late_frac=0.02)
    write_arrival_files(pdf, src)
    write_sentinel_file(src, dt.datetime(2026, 1, 1))
    return src, len(pdf)


def run_one(cpus: int, src: str, n_turns: int) -> dict:
    """One measurement in THIS process (fresh JVM): the full CEP chain."""
    from pyspark.sql import functions as F

    from pipeflow_spark.operators import text
    from pipeflow_spark.session import get_spark
    from pipeflow_spark.streaming import ExactlyOnceSink, StreamingPipeline

    spark = get_spark(
        f"scaling_{cpus}",
        cpus=cpus,
        shuffle_partitions=cpus,
        # split each arrival file into many scan tasks (row groups are ~4 MB)
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # warm codegen path

    work = tempfile.mkdtemp(prefix=f"pipeflow_scale_{cpus}_")
    sink = ExactlyOnceSink(os.path.join(work, "sink"))
    c = F.col("text")
    sp = (
        StreamingPipeline.read_transcripts(spark, src, max_files_per_trigger=1)
        .with_watermark("ts", "10 minutes")
        .dedupe_within_watermark(["conv_id", "turn_idx"])
        # the vectorized per-turn profile (all JVM Column algebra — the
        # north-rule Transform stage, no per-row Python)
        .add_column("n_tokens", text.token_count(c))
        .add_column("n_bpe", text.bpe_ish_token_count(c))
        .add_column("lang", text.lang_id(c))
        .add_column("quality", text.quality_score(c))
        .add_column("fp", text.fingerprint(c))
        .tumbling_agg(
            "ts",
            "5 minutes",
            ["conv_id"],
            F.count("*").alias("n_turns"),
            F.sum("n_tokens").alias("tok_total"),
            F.sum("n_bpe").alias("bpe_total"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.max("turn_idx").alias("max_turn"),
            F.approx_count_distinct("fp").alias("n_uniq_texts"),
            F.approx_count_distinct("lang").alias("n_langs"),
        )
        .select(
            F.col("w.start").alias("ws"),
            "conv_id",
            "n_turns",
            "tok_total",
            "bpe_total",
            "avg_quality",
            "max_turn",
            "n_uniq_texts",
            "n_langs",
        )
    )
    t0 = time.monotonic()
    q = sp.start_exactly_once(sink, os.path.join(work, "ckpt"), output_mode="append")
    q.awaitTermination()
    wall = time.monotonic() - t0
    out_rows = sum(m["rows"] for m in sink.metrics())
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return {
        "cpus": cpus,
        "turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "out_rows": out_rows,
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        cpus = int(sys.argv[2])
        src, n_turns = sys.argv[3], int(sys.argv[4])
        print("RESULT " + json.dumps(run_one(cpus, src, n_turns)))
        return

    work = tempfile.mkdtemp(prefix="pipeflow_scaling_input_")
    src, n_turns = build_input(work)
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus), src, str(n_turns)],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=1800,
        )
        line = next((l for l in proc.stdout.splitlines() if l.startswith("RESULT ")), None)
        if line is None:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"worker local[{cpus}] failed")
        results[cpus] = json.loads(line[len("RESULT "):])
    t8, t32 = results[8]["turns_per_sec"], results[32]["turns_per_sec"]
    assert results[8]["out_rows"] == results[32]["out_rows"], "output mismatch across parallelism"
    print(
        json.dumps(
            {
                "job": "watermark->dedupe->vectorized_profile->tumbling_agg->exactly_once_sink",
                "input_turns": n_turns,
                "local8": results[8],
                "local32": results[32],
                "scaling_efficiency": round(t32 / (4 * t8), 3),
            }
        )
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
