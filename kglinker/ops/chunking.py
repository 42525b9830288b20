"""Context-window preparation: document chunking + sequence packing.

The two stages between a cleaned corpus and a training run:

- :func:`chunk_documents` — split each document into fixed-size token
  windows with overlap (sliding stride = chunk − overlap), entirely
  IN-ROW: a ``sequence`` over chunk starts + ``transform``/``slice`` on
  the split token array, then one explode. No shuffle at all — the scan
  parallelism is the plan.
- :func:`pack_documents` — assign documents to fixed-token-budget
  training sequences by running token count (the standard
  concat-then-split approximation of bin packing: deterministic,
  single-pass, no NP-hard optimization). The running sum is a window
  per ``by`` group (source, lang) — bounded partitions, NOT a global
  order-by (a single global window would serialize the corpus; at
  100 TB the group key set is what keeps every partition executor-sized,
  and a too-hot group can be salted into sub-streams whose bins are
  offset afterwards).

Both emit exact integer arithmetic only — the DuckDB oracles replay
them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["chunk_documents", "pack_documents"]


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_tokens): sliding token
    windows of ``chunk_tokens`` with ``overlap`` tokens shared between
    consecutive chunks (stride = chunk_tokens − overlap). The final
    window may be short; a document shorter than one chunk yields
    exactly one chunk. Pure column expressions — zero exchanges."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # starts: 0, stride, 2*stride, … while start < n (at least one)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens))
             .alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - i * stride)
             .cast("int").alias("n_chunk_tokens")))
    return (docs.select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id", "c.chunk_idx", "c.chunk_text",
                    "c.n_chunk_tokens"))


def pack_documents(docs: DataFrame, seq_tokens: int = 512,
                   by: list[str] | None = None) -> DataFrame:
    """(doc_id, n_tokens, seq_idx, seq_offset): concat-then-split
    packing — documents are laid end-to-end in (``by``…, doc_id) order
    and cut into ``seq_tokens``-sized training sequences; ``seq_idx``
    is the sequence a document STARTS in and ``seq_offset`` its token
    offset there (a document longer than the remainder simply continues
    into the following sequences, as concat-packing does). One window
    shuffle on the ``by`` keys; sequence numbering restarts per group."""
    if by is None:
        by = ["source", "lang"]
    n = F.size(F.split(F.col("text"), " "))
    w = (Window.partitionBy(*by).orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    return (docs.select(*by, "doc_id", n.alias("n_tokens"))
            .withColumn("_start", start)
            .select(*by, "doc_id", "n_tokens",
                    (F.col("_start") / seq_tokens).cast("int")
                    .alias("seq_idx"),
                    (F.col("_start") % seq_tokens).cast("int")
                    .alias("seq_offset")))
