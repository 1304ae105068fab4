"""Python UDTFs — the table-function leg of the UDF surface (§2.11).

The engine's UDF tiers: scalar Arrow-batched pandas UDFs and
mapInPandas kernels (multimodal.py, pq.py), grouped state
(applyInPandasWithState, streaming/stateful.py), and — here — Python
user-defined TABLE functions (`pyspark.sql.functions.udtf`,
Spark 3.5+): one input row fans out to N output rows with a declared
schema, usable both from the DataFrame API and via LATERAL join after
``spark.udtf.register``.

UDTFs are row-at-a-time Python — the SLOW tier (no Arrow batching),
kept for shapes that are genuinely per-row generative and off the hot
path. Anything corpus-sized goes through the vectorized twins instead
(``chunk_token_spans`` in text.py is the production chunker; the UDTF
here is the API-surface twin over the same semantics, pinned equal in
tests). The sentence splitter exists only as a UDTF — per-row
generative parsing with data-dependent fan-out is exactly the UDTF
shape.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["ChunkSpans", "SentenceSpans", "register_udtfs"]


@udtf(returnType="chunk_id int, start_token int, n_chunk_tokens int, chunk_text string")
class ChunkSpans:
    """Fixed-size overlapping token chunks of one document — the UDTF
    twin of text.chunk_token_spans: same normalize (lower, strip
    non-alnum, collapse spaces), same stride = chunk − overlap, same
    one-chunk rule for short docs; pinned set-equal in tests."""

    def eval(self, text: str, chunk_tokens: int = 32, overlap: int = 8):
        if text is None:
            return
        import re

        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
        toks = [t for t in norm.split(" ") if t]
        if not toks:
            return
        stride = chunk_tokens - overlap
        n = len(toks)
        if n <= chunk_tokens:
            n_chunks = 1
        else:
            n_chunks = (n - chunk_tokens + stride - 1) // stride + 1
        for cid in range(n_chunks):
            start = cid * stride
            span = toks[start : start + chunk_tokens]
            yield cid, start, len(span), " ".join(span)


@udtf(returnType="sentence_id int, sentence string, n_words int")
class SentenceSpans:
    """Naive sentence segmentation (split on . ! ? followed by space),
    one output row per non-empty sentence — data-dependent fan-out,
    the canonical UDTF shape."""

    def eval(self, text: str):
        if text is None:
            return
        import re

        parts = re.split(r"(?<=[.!?])\s+", text)
        sid = 0
        for p in parts:
            p = p.strip()
            if p:
                yield sid, p, len(p.split())
                sid += 1


def register_udtfs(spark) -> None:
    """Expose both UDTFs to SQL: ``SELECT d.doc_id, c.* FROM docs d,
    LATERAL chunk_spans(d.text, 32, 24) c``."""
    spark.udtf.register("chunk_spans", ChunkSpans)
    spark.udtf.register("sentence_spans", SentenceSpans)
