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


@udtf
class JsonFields:
    """POLYMORPHIC table function: (json_str, 'f1,f2,…') → one row with
    one STRING column PER REQUESTED FIELD — the output schema is
    computed at analysis time from the constant field-list argument
    (`analyze`), so each call site gets exactly the columns it asked
    for and Catalyst resolves/prunes them like any other relation.

    This is the UDTF tier above a fixed returnType: schema-on-demand
    JSON shredding for exploratory SQL, without registering a schema
    per shape. Missing/invalid fields yield NULL; scalar values arrive
    as their JSON text (numbers unquoted, matching DuckDB's
    json_extract_string, which the oracle uses).
    """

    @staticmethod
    def analyze(js, fields):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if fields.value is None:
            raise ValueError("json_fields: field list must be a constant string")
        schema = StructType()
        for f in str(fields.value).split(","):
            schema = schema.add(f.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, js: str, fields: str):  # noqa: D102 - contract above
        import json as _json

        names = [f.strip() for f in str(fields).split(",")]
        try:
            obj = _json.loads(js) if js else {}
        except (ValueError, TypeError):
            obj = {}
        if not isinstance(obj, dict):
            obj = {}

        def render(v):
            if v is None:
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, (dict, list)):
                return _json.dumps(v, separators=(",", ":"))
            return str(v)

        yield tuple(render(obj.get(n)) if n in obj else None for n in names)


def register_udtfs(spark) -> None:
    """Register every engine UDTF on the given session (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("token_ngrams", TokenNgrams)
    spark.udtf.register("json_fields", JsonFields)
