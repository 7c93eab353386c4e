"""SQL-callable Python table functions (Spark 4 UDTFs).

The reference exposes its whole surface through SQL; most of this engine's
operators are column-expression pipelines (the fast path — JVM codegen,
no Python).  These UDTFs close the ERGONOMICS gap for the row-generating
ops a SQL user wants to call inline with ``LATERAL``:

    SELECT d.doc_id, c.chunk_id, c.chunk
    FROM documents d, LATERAL chunks(d.text, 200, 20) c

UDTFs are row-at-a-time Python — the SLOW path by design.  For bulk jobs
use the expression pipelines (``operators/text.chunk_documents``,
``word_shingles``); register these when interactive SQL ergonomics beat
throughput (exploratory sessions, small slices).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["ChunksUdtf", "NgramsUdtf", "register_udtfs"]


@udtf(returnType="chunk_id int, chunk string")
class ChunksUdtf:
    """Overlapping character windows: ``size`` chars advancing by
    ``size - overlap``; the final window is the first that reaches the end
    (no empty tail chunk)."""

    def eval(self, text: str, size: int, overlap: int):
        # negative overlap would SKIP characters between windows (silent
        # text loss for a chunker that promises overlap) — invalid params
        # consistently yield no rows
        if not text or size <= 0 or overlap < 0 or overlap >= size:
            return
        step = size - overlap
        i, cid = 0, 0
        while i < len(text):
            yield cid, text[i : i + size]
            if i + size >= len(text):
                break
            i += step
            cid += 1


@udtf(returnType="pos int, gram string")
class NgramsUdtf:
    """Word n-grams over whitespace tokens (empty tokens dropped), joined
    with single spaces — the shingle primitive as a SQL table function."""

    def eval(self, text: str, n: int):
        if not text or n <= 0:
            return
        toks = [t for t in text.split(" ") if t]
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Register every table function under its SQL name."""
    spark.udtf.register("chunks", ChunksUdtf)
    spark.udtf.register("ngrams", NgramsUdtf)
