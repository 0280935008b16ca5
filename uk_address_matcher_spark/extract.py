"""Derive the flat address view from interleaved documents.

Contract (BASELINE.json `input_hint` + FIXTURES.md F1):
 - ``address_concat``: space-join of kind='text' span texts in offset order
 - ``postcode``: text of the (single) kind='postcode' span (null if absent)
 - media spans pass through untouched; ``spans`` is NEVER mutated — the
   per-row invariant is span-sequence equality (kind, text, media_ref,
   order) between input and anything this module returns.

Everything is a pure Catalyst expression (no UDFs, no shuffles): the
extraction is a projection, so it fuses into the downstream cleaning
pipeline's whole-stage-codegen span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordered_spans(spans: Column = None) -> Column:
    spans = F.col("spans") if spans is None else spans
    # sort by offset: lift offset to the first struct field, array_sort
    keyed = F.transform(
        spans,
        lambda s: F.struct(
            s["offset"].alias("offset"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    return F.array_sort(keyed)


def address_concat_col(spans: Column = None) -> Column:
    ordered = _ordered_spans(spans)
    texts = F.transform(
        F.filter(ordered, lambda s: s["kind"] == F.lit("text")), lambda s: s["text"]
    )
    return F.array_join(texts, " ")


def postcode_col(spans: Column = None) -> Column:
    ordered = _ordered_spans(spans)
    pcs = F.filter(ordered, lambda s: s["kind"] == F.lit("postcode"))
    # try_element_at: null (not ANSI error) when no postcode span exists,
    # matching DuckDB's null-safe list_extract semantics
    return F.try_element_at(pcs, F.lit(1))["text"]


def media_refs_col(spans: Column = None) -> Column:
    ordered = _ordered_spans(spans)
    return F.transform(
        F.filter(ordered, lambda s: s["kind"] == F.lit("media")),
        lambda s: s["media_ref"],
    )


def extract_addresses(documents: DataFrame, keep_spans: bool = False) -> DataFrame:
    """documents(doc_id, spans, ...) -> (unique_id, address_concat, postcode [, spans]).

    Rows with no postcode span (non-address documents in a mixed corpus)
    are kept with postcode NULL; callers filter as needed. Extra columns
    pass through.
    """
    extra = [c for c in documents.columns if c not in ("doc_id", "spans")]
    cols = [
        F.col("doc_id").alias("unique_id"),
        address_concat_col().alias("address_concat"),
        postcode_col().alias("postcode"),
    ]
    if keep_spans:
        cols.append(F.col("spans"))
    return documents.select(*cols, *extra)


def span_signature(spans: Column = None) -> Column:
    """Canonical string signature of the span sequence — for invariant tests.

    Equality of signatures == equality of (kind, text, media_ref, order).
    """
    ordered = _ordered_spans(spans)
    return F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws("\x1f", s["kind"], s["text"], s["media_ref"]),
        ),
        "\x1e",
    )
