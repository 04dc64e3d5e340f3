#!/usr/bin/env python3
"""End-to-end training-corpus curation pipeline, composed from the llm/
operator library. Every stage is a DataFrame transform, so the whole
pipeline is ONE lazily-planned DAG that Catalyst optimizes across stage
boundaries — run it on a 500-doc sample or a 100 TB corpus unchanged.

    python examples/curation_pipeline.py [sf_dir]

Stages (the standard web-corpus recipe):
  1. quality gate      — keep docs scoring above a floor
  2. language filter   — keep the languages you train on
  3. exact dedup       — collapse verbatim copies (canonical = min doc_id)
  4. near-dedup        — MinHash-LSH pairs -> connected components ->
                         keep each cluster's canonical doc
  5. decontamination   — drop docs fuzzily matching a benchmark slice
  6. PII scrub         — typed redaction of emails/phones/IPs/SSNs
  7. chunk + pack      — overlapping word windows packed to a token budget
  8. training order    — deterministic shuffle for the data loader
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir: str):
    """Return {stage_name: DataFrame} — all lazy, nothing executed yet."""
    from pyspark.sql import functions as F

    from flink_siddhi_spark.llm.dedup import (
        fuzzy_dedup_keep,
        streaming_contamination_gate,
    )
    from flink_siddhi_spark.llm.pipeline import (
        chunk_documents,
        pack_sequences,
        training_order,
    )
    from flink_siddhi_spark.llm.text import pii_scrub, quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1-2: quality + language gates (pure projections — fuse into the scan)
    gated = quality_score(docs).filter(F.col("quality") >= 0.3)
    gated = gated.filter(F.col("lang").isin("en", "es")).select(
        "doc_id", "text", "lang", "source"
    )

    # 3: exact dedup — keep the min-id doc per content hash
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = gated.withColumn("__rk", F.row_number().over(w)).filter("__rk = 1").drop("__rk")

    # 4: near-dedup — the one-call composition (round 4): LSH candidates ->
    # connected components -> keep each cluster's min-id canonical
    deduped = fuzzy_dedup_keep(exact, threshold=0.5)

    # 5: fuzzy decontamination against a benchmark slice
    bench = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", "text")
    clean = streaming_contamination_gate(deduped, bench)

    # 6: PII scrub (redacted text becomes the pipeline text)
    scrubbed = (
        pii_scrub(clean).drop("text").withColumnRenamed("scrubbed", "text")
    )

    # 7: chunk + pack to a token budget (chunks get synthetic ids)
    chunks = chunk_documents(scrubbed, size=64, stride=48)
    chunk_ids = chunks.select(
        (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    packed = pack_sequences(chunk_ids, budget=256)

    # 8: deterministic training order over the packed chunks
    ordered = training_order(packed)

    return {
        "input": docs,
        "gated": gated,
        "exact_deduped": exact,
        "near_deduped": deduped,
        "decontaminated": clean,
        "packed": packed,
        "ordered": ordered,
    }


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("curation-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stages = build(spark, sf_dir)
    for name, df in stages.items():
        print(f"{name:16s} {df.count():8d} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
