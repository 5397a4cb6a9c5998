"""End-to-end training-corpus preparation — the engine's capstone
pipeline, composing the operator families into the artifact a trainer
consumes:

1. filter verdicts (quality + lang + exact-dup, ops/text.py
   filter_decisions) — drop low-quality/duplicate/foreign docs;
2. near-duplicate removal (LSH candidates → candidate-driven Jaccard →
   connected components, ops/dedup.py) — keep each group's canonical;
3. span-level dedup (C4 rule, ops/text.py span_dedup) — strip
   cross-document boilerplate from the survivors;
4. redaction (ops/text.py redact) — scrub PII-shaped spans;
5. deterministic train/eval split (ops/sampling.py with_split);
6. sequence packing of the train split (pack_sequences +
   pack_materialize) into token-budget training rows;
7. clustered parquet writes (io/sinks.write_parquet_clustered) so
   downstream scans prune.

Every stage is the documented scale path of its operator; the whole
pipeline is shuffle-linear in corpus size (the worst exchange is the
span window). Stage counts are returned for auditability — a corpus
prep run that cannot say how many docs each gate dropped is not
reproducible.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.io.sinks import write_parquet_clustered
from lime_etl_spark.io.sources import read_table
from lime_etl_spark.ops import dedup, quality, sampling, text
from lime_etl_spark.ops.text import token_count


def prepare_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    budget: int = 512,
    jaccard_threshold: float = 0.5,
    train_pct: int = 90,
    salt: str = "corpus-v1",
) -> dict[str, int]:
    """Run the full preparation pipeline over ``sf_dir``/documents and
    write train (packed) + eval (raw) parquet under ``out_dir``.

    Returns stage counts: total -> after_filter -> after_near_dedup,
    plus split sizes and packed-bin count. Deterministic end to end
    (hash splits, fixed salts, canonical-min survivors) — re-running
    yields byte-identical artifacts.
    """
    docs = read_table(spark, sf_dir, "documents")

    # 0. input contract: doc_id is the dedup/split/pack identity — a
    # NULL or duplicated id silently corrupts every downstream stage,
    # so the pipeline refuses such input instead of processing it.
    # with_row_count folds the audit total into the same scan.
    n_total = quality.gate(
        docs,
        [quality.not_null("doc_id"), quality.unique("doc_id")],
        with_row_count=True,
    )

    # 1. filter verdicts — keep only 'keep'
    verdicts = text.filter_decisions(docs)
    kept = docs.join(
        verdicts.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    n_filtered = kept.count()

    # 2. near-dup groups on the filtered corpus; canonical doc survives
    pairs = dedup.minhash_near_dups(kept, threshold=jaccard_threshold)
    comp = dedup.connected_components(pairs)
    dropped = comp.filter(F.col("doc_id") != F.col("component_id")).select("doc_id")
    survivors = kept.join(dropped, "doc_id", "left_anti")
    n_deduped = survivors.count()

    # 3. span-level boilerplate removal, 4. redaction
    spans = text.span_dedup(survivors)
    clean = text.redact(
        spans.select("doc_id", F.col("text_deduped").alias("text")),
        out="text",
    ).select("doc_id", "text")

    # 5. deterministic split
    split = sampling.with_split(clean, "doc_id", train_pct=train_pct, salt=salt)
    train = split.filter(F.col("split") == "train").drop("split")
    evald = split.filter(F.col("split") == "eval").drop("split")

    # 6. pack the train split into token-budget rows
    sized = train.withColumn("n_tokens", token_count("text").cast("bigint"))
    packed = sampling.pack_sequences(sized, budget=budget, salt=salt)
    bins = sampling.pack_materialize(packed, salt=salt)

    # 7. clustered writes: train bins by pack_bin, eval docs by doc_id
    write_parquet_clustered(bins, os.path.join(out_dir, "train"), ["pack_bin"])
    write_parquet_clustered(evald, os.path.join(out_dir, "eval"), ["doc_id"])

    train_bins = spark.read.parquet(os.path.join(out_dir, "train"))
    n_eval = spark.read.parquet(os.path.join(out_dir, "eval")).count()
    return {
        "n_total": n_total,
        "n_after_filter": n_filtered,
        "n_after_near_dedup": n_deduped,
        "n_train_docs": int(
            train_bins.agg(F.sum("n_docs")).collect()[0][0] or 0
        ),
        "n_train_bins": train_bins.count(),
        "n_eval_docs": n_eval,
    }
