"""Python UDTF surface (Spark 4): a lazy document chunker whose output
must equal the native transform/slice implementation in
registry.text_chunking."""

from __future__ import annotations

import re

from pyspark.sql.functions import col, lit, udtf

from lime_etl_spark.io.sources import read_table
from lime_etl_spark.registry import REGISTRY


@udtf(returnType="chunk_idx BIGINT, chunk STRING")
class ChunkDoc:
    """Yield 32-token chunks of a document — UDTF form of the chunking
    operator (the native column-expression form is the hot path; the
    UDTF exists for user-defined table functions that have no
    expression equivalent)."""

    def eval(self, text: str):
        toks = re.findall("[a-z0-9]+", (text or "").lower())
        for i in range(0, (len(toks) + 31) // 32):
            yield i, " ".join(toks[i * 32 : (i + 1) * 32])


def test_udtf_matches_native_chunker(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(100)
    docs.createOrReplaceTempView("docs_udtf")
    spark.udtf.register("chunk_doc", ChunkDoc)
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM docs_udtf d, LATERAL chunk_doc(d.text) c
        """
    )
    native = (
        REGISTRY["text_chunking"].spark_fn(spark, sf_dir)
        .select("doc_id", "chunk_idx", "chunk")
        .join(docs.select("doc_id"), "doc_id", "left_semi")
    )
    g = {tuple(r) for r in got.collect()}
    n = {tuple(r) for r in native.collect()}
    assert g == n and len(g) > 0
