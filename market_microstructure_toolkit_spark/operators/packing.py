"""Sequence packing for training-data pipelines.

Pretraining consumes fixed-length token sequences, not documents: the
standard scheme concatenates documents (in a deterministic order) into a
token stream and chunks the stream every ``budget`` tokens, letting
documents span chunk boundaries. This module computes that packing as
pure DataFrame algebra — which document lands in which sequence, and the
per-sequence occupancy stats a pipeline reports (sequences produced,
docs per sequence, boundary-splits).

Scale design: a single global concat order would be an unpartitioned
window — one task sorting the whole corpus. Real pipelines pack per
shard/file anyway (cross-shard order is meaningless to the model), so
the stream is sharded by ``pmod(doc_id, n_shards)`` and the running
token offset is a window cumsum PARTITIONED by shard: n_shards
independent sorts, each a fraction of the data, and the downstream
stats groupBy is keyed on (shard, seq) — uniform keys, one shuffle.
At 100 TB you raise ``n_shards`` to the parallelism you want (or swap
the shard key for the ingest file id, which makes the sort a per-file
local sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_assignments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    n_shards: int = 8,
    segmented: bool = False,
) -> DataFrame:
    """Per-(document, sequence) packing assignment.

    Within each shard, documents concatenate in ``id_col`` order; the
    stream is chunked every ``budget`` whitespace tokens. A document
    covering stream interval [start, end) overlaps sequences
    floor(start/budget) .. floor((end-1)/budget) and contributes
    ``tok_in_seq`` tokens to each — exact interval arithmetic, no
    iteration. Output: (shard, seq_id, doc_id, tok, tok_in_seq).
    """
    tok = F.size(F.split(F.col(text_col), " ", -1)).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
    toks = df.select(shard, F.col(id_col), tok.alias("tok"))
    if segmented:
        # per-shard rows = corpus / n_shards — grows with data; the
        # segmented prefix-sum keeps each shard's cumsum parallel
        # (integer token counts, so the regrouping is exact)
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_cumulative_segmented,
        )

        # cast back to long: the segmented scan's null-carry coalesce
        # promotes the running total to double (exact for token counts
        # far below 2^53) while the plain window sum stays BIGINT
        cum = (
            add_cumulative_segmented(
                toks, "tok", out_col="end", keys=("shard",), order_col=id_col
            )
            .withColumn("end", F.col("end").cast("long"))
            .withColumn("start", F.col("end") - F.col("tok"))
        )
    else:
        w = Window.partitionBy("shard").orderBy(id_col)
        cum = toks.withColumn("end", F.sum("tok").over(w)).withColumn(
            "start", F.col("end") - F.col("tok")
        )
    b = F.lit(budget)
    spans = cum.withColumn(
        "seq_id",
        F.explode(
            F.sequence(F.floor(F.col("start") / b), F.floor((F.col("end") - 1) / b))
        ),
    )
    return spans.select(
        "shard",
        "seq_id",
        id_col,
        "tok",
        (
            F.least(F.col("end"), (F.col("seq_id") + 1) * b)
            - F.greatest(F.col("start"), F.col("seq_id") * b)
        ).alias("tok_in_seq"),
    )


def pack_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    n_shards: int = 8,
    segmented: bool = False,
) -> DataFrame:
    """Per-sequence occupancy: (shard, seq_id, n_docs, seq_tokens).

    Every sequence except each shard's last holds exactly ``budget``
    tokens — the invariant that proves the interval arithmetic right.
    """
    spans = pack_assignments(df, text_col, id_col, budget, n_shards, segmented)
    return spans.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_in_seq").alias("seq_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    ``chunk_tokens``-token windows advancing ``chunk_tokens - overlap``
    tokens per step — the retrieval/context-window preprocessing pass
    (each chunk shares ``overlap`` tokens with its predecessor so no
    span is ever cut without context).

    Chunk count per doc: 1 if n <= chunk_tokens, else
    ``floor((n - chunk_tokens + step - 1) / step) + 1`` (the final chunk
    is the first whose window reaches the end; slicing clamps). Pure
    per-row array expressions behind one Generate — map-only, no
    shuffle, embarrassingly parallel at any corpus size. The token
    array binds to a lambda variable before slicing (the repo-standard
    guard against O(tokens^2) re-splitting).
    """
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap
    from market_microstructure_toolkit_spark.operators.dedup import tokens

    def chunks_of(toks):
        n = F.size(toks)
        extra = F.floor(
            (n - F.lit(chunk_tokens) + F.lit(step - 1)).cast("double")
            / F.lit(step)
        ).cast("long")
        n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(extra + 1)
        idx = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        return F.transform(
            idx,
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.concat_ws(
                    " ",
                    F.slice(
                        toks, (i * step + 1).cast("int"), chunk_tokens
                    ),
                ).alias("chunk_text"),
                F.size(
                    F.slice(toks, (i * step + 1).cast("int"), chunk_tokens)
                ).cast("long").alias("n_chunk_tokens"),
            ),
        )

    arr = F.element_at(
        F.transform(F.array(tokens(text_col)), chunks_of), 1
    )
    return df.select(
        F.col(id_col), F.explode(arr).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
