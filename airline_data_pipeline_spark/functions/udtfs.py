"""Python UDTFs (SURVEY.md §2.9 U3 — the table-function surface).

A UDTF is the Spark-native shape for one-row→many-rows Python logic
that can't be a column expression: each `eval` yields output rows, and
the function composes in SQL as a `LATERAL` table factor, so Catalyst
still sees a join it can place and prune around. Used here for
sentence segmentation — the text-pipeline step between document-level
stats and token-level processing.

Semantics are deliberately regex-engine-portable: a sentence boundary
is whitespace FOLLOWING [.!?]. Python implements it with a lookbehind
split; the SQL oracle (RE2 has no lookbehind) implements the identical
relation with a capture-group replace + split. Both trim and drop
empties.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_BOUNDARY = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """(text) → one row per sentence with its 0-based position."""

    def eval(self, text: str):  # noqa: D102 - contract documented above
        if text is None:
            return
        for i, part in enumerate(
            p for p in (s.strip() for s in _BOUNDARY.split(text)) if p
        ):
            yield (i, part)


_WS = re.compile(r"\s+")


@udtf(returnType="pos int, ngram string")
class TokenNgrams:
    """(text, n) → one row per word n-gram with its 0-based position.

    Tokens are the engine's standard whitespace tokens (`\\s+` split,
    empties dropped — the same definition functions/text.py and the
    DuckDB oracles use), joined back with a single space. A doc with
    fewer than n tokens yields no rows.
    """

    def eval(self, text: str, n: int):  # noqa: D102 - contract documented above
        if text is None or n is None or n < 1:
            return
        toks = [t for t in _WS.split(text.strip()) if t]
        for i in range(len(toks) - n + 1):
            yield (i, " ".join(toks[i : i + n]))


def register_udtfs(spark) -> None:
    """Register every engine UDTF on the given session (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("token_ngrams", TokenNgrams)
