"""Distributed sequence packing (concatenate-and-chunk).

The last op of an LLM training-data pipeline: documents are
concatenated in a deterministic total order within each source stream
and the resulting token stream is cut into fixed-capacity training
sequences.  The assignment is pure integer arithmetic over an
EXCLUSIVE PREFIX SUM of per-document token counts — and that prefix
sum is the distributed hard part: a naive
``Window.partitionBy(source).orderBy(doc_id)`` funnels every row of a
source into ONE task for the sort (the q_topk_users mistake at 10^12
scale).

Scale shape here — a two-level prefix sum with only bounded sorts:

1. bucket docs by contiguous order-key ranges
   (``order_col // bucket_size``) and groupBy-sum token counts per
   (source, bucket): a partial aggregation, output is
   ``n_docs / bucket_size`` rows;
2. run the unbounded running-sum window ONLY over that tiny per-bucket
   table to get each bucket's starting token offset;
3. broadcast-join the bucket offsets back and window WITHIN
   (source, bucket) — every sort is bounded by ``bucket_size`` rows.

Choose ``bucket_size`` ~ sqrt(max docs per source): both the one-task
bucket-table window (n/bucket_size rows) and each within-bucket sort
(bucket_size rows) then stay ~10^6 at 10^12 docs.  (A third level
would drop the bound to n^(1/3); two suffice for any realistic corpus.)

No reference analog: tinybrain has no packing; this is engine surface
for the token-pipeline addendum (SURVEY.md training-data ops).  The
semantics (concat in doc order, split at capacity boundaries, a doc
may span sequences) are the GPT-style packing used for causal-LM
pretraining; ``n_spans`` counts how many sequences a doc crosses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    docs: DataFrame,
    *,
    n_col: str = "n_tok",
    order_col: str = "doc_id",
    source_col: str = "source",
    capacity: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign each document its global token offset and sequence span.

    Adds to ``docs`` (all BIGINT, exact integer arithmetic — safe under
    ANSI mode and byte-identical to the DuckDB oracle):

    - ``tok_start``  — exclusive prefix sum of ``n_col`` over
      ``order_col`` within ``source_col`` (the doc's first token's
      global position in its source stream);
    - ``seq_id``     — ``tok_start DIV capacity``: the training
      sequence the doc starts in;
    - ``seq_offset`` — ``tok_start % capacity``: position within it;
    - ``n_spans``    — number of distinct sequences the doc touches
      (0 for an empty doc).

    The plan has exactly three exchanges regardless of data volume:
    the per-bucket partial agg, the (tiny) bucket-table window, and
    the within-bucket window; the bucket-offset join is a broadcast.
    """
    bucket = F.expr(f"{order_col} DIV {bucket_size}")
    with_b = docs.withColumn("_bucket", bucket)

    per_bucket = with_b.groupBy(source_col, "_bucket").agg(
        F.sum(n_col).cast("long").alias("_btok")
    )
    wb = Window.partitionBy(source_col).orderBy("_bucket")
    b_off = per_bucket.select(
        source_col,
        "_bucket",
        (F.sum("_btok").over(wb) - F.col("_btok")).cast("long").alias("_bstart"),
    )

    wd = Window.partitionBy(source_col, "_bucket").orderBy(order_col)
    joined = with_b.join(F.broadcast(b_off), [source_col, "_bucket"])
    out = joined.withColumn(
        "tok_start",
        (
            F.col("_bstart")
            + F.sum(n_col).over(wd)
            - F.col(n_col)
        ).cast("long"),
    ).drop("_bucket", "_bstart")

    n = F.col(n_col).cast("long")
    start = F.col("tok_start")
    seq_id = F.expr(f"tok_start DIV {capacity}")
    return (
        out.withColumn("seq_id", seq_id.cast("long"))
        .withColumn("seq_offset", (start % capacity).cast("long"))
        .withColumn(
            "n_spans",
            F.when(n <= 0, F.lit(0))
            .otherwise(
                F.expr(f"(tok_start + {n_col} - 1) DIV {capacity}")
                - seq_id
                + 1
            )
            .cast("long"),
        )
    )


def pack_bins_nosplit(
    docs: DataFrame,
    *,
    n_col: str = "n_tok",
    order_col: str = "doc_id",
    source_col: str = "source",
    capacity: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """No-split packing: each document lands WHOLLY inside one bin
    (SFT-style packing, where an example must not cross a sequence
    boundary).  Deterministic next-fit in ``order_col`` order, run
    independently per (source, bucket): a bin closes when the next doc
    would overflow ``capacity``; a doc longer than ``capacity`` gets a
    bin of its own, flagged ``oversize``.

    Returns ``docs`` + (``bin_id``: string — globally unique, namespaced
    ``source/bucket/local``, ``bin_fill``: the doc's start offset in its
    bin, ``oversize``: boolean).

    Scale shape: next-fit is inherently sequential, so exact global
    next-fit cannot parallelize.  Bucket-local next-fit restores
    parallelism at a bounded price — at most one partially-filled bin
    per bucket boundary, i.e. wasted space < capacity per bucket_size
    docs (<0.1% for any realistic ratio).  Each applyInPandas group
    holds <= bucket_size rows; no unbounded state anywhere.
    """
    import pandas as pd

    out_schema = (
        docs.withColumn("_bucket", F.lit(0).cast("long"))
        .withColumn("bin_id", F.lit("x"))
        .withColumn("bin_fill", F.lit(0).cast("long"))
        .withColumn("oversize", F.lit(False))
        .schema
    )

    def _next_fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, ignore_index=True)
        src = pdf[source_col].iloc[0]
        bucket = int(pdf["_bucket"].iloc[0])
        bins, fills, overs = [], [], []
        local, fill = 0, 0
        for n in pdf[n_col].astype("int64"):
            n = int(n)
            if n > capacity:
                # oversize doc: a dedicated (flagged) bin of its own
                if fill > 0:
                    local += 1
                bins.append(local)
                fills.append(0)
                overs.append(True)
                local += 1
                fill = 0
                continue
            if fill + n > capacity:
                local += 1
                fill = 0
            bins.append(local)
            fills.append(fill)
            overs.append(False)
            fill += n
        pdf["bin_id"] = [f"{src}/{bucket}/{b}" for b in bins]
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        pdf["oversize"] = overs
        return pdf

    bucket = F.expr(f"{order_col} DIV {bucket_size}")
    with_b = docs.withColumn("_bucket", bucket.cast("long"))
    packed = with_b.groupBy(source_col, "_bucket").applyInPandas(
        _next_fit, out_schema
    )
    return packed.drop("_bucket")


def pack_tokens(
    seqs: DataFrame,
    *,
    tokens_col: str = "tokens",
    order_col: str = "user_id",
    capacity: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """Materialize packed training sequences from per-key token arrays.

    ``seqs`` is (order_col, tokens_col: array<int>); streams are
    concatenated in ``order_col`` order and re-cut at ``capacity``
    boundaries.  Returns exploded rows
    (``seq_id``, ``pos``, ``token``) — one row per token, relabeled to
    its packed sequence — so the result is hash-comparable against a
    pure-SQL oracle.  Callers that want the packed arrays themselves
    group this by ``seq_id`` and ``array_agg`` (same single exchange).

    The offset assignment reuses :func:`pack_offsets` (two bounded
    windows, no per-source global sort); the explode is map-side.
    """
    with_n = seqs.withColumn("_n", F.size(tokens_col).cast("long")).withColumn(
        "_src", F.lit("all")
    )
    off = pack_offsets(
        with_n,
        n_col="_n",
        order_col=order_col,
        source_col="_src",
        capacity=capacity,
        bucket_size=bucket_size,
    )
    pos = F.col("tok_start") + F.col("_pos")
    return off.select(
        "tok_start", F.posexplode(tokens_col).alias("_pos", "_tok")
    ).select(
        F.expr(f"(tok_start + _pos) DIV {capacity}").cast("long").alias("seq_id"),
        (pos % capacity).cast("long").alias("pos"),
        F.col("_tok").cast("long").alias("token"),
    )
