"""Review analyzer actor pool (S11/T6) — the enrichment stage.

The reference's parser Lambda calls AWS Comprehend per comment — two
goroutines (DetectSentiment + DetectEntities, Spanish) per review
(/root/reference/pkg/itemparser/analyzer.go:42-116), behind a
``sync.Once`` singleton client (analyzer.go:24-40). Here the same shape
is a ``map_batches`` actor pool: the "model" loads once per actor in
``__init__`` (the actor-pool analog of the singleton), batches of items
flow through ``__call__``.

No network/NLP libs exist in this sandbox, so the model is a
DETERMINISTIC STUB keyed by review-content hash (FIXTURES.md §5):
sentiment = md5(content) bucket, entities = capitalized tokens. The
plumbing — nested list<struct> traversal, per-actor state, batch
sizing — is the real, tested part; swapping in a real model is a
one-line change in ``_load_model``.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

SENTIMENTS = ["POSITIVE", "NEGATIVE", "NEUTRAL", "MIXED"]

ENRICHED_REVIEW_TYPE = pa.struct(
    [
        ("title", pa.string()),
        ("content", pa.string()),
        ("author", pa.string()),
        ("stars", pa.float64()),
        ("date", pa.string()),  # Comment.Date repr (M18, item.go:326)
        ("sentiment", pa.string()),
        ("entities", pa.list_(pa.string())),
    ]
)


class ReviewAnalyzer:
    """``map_batches(ReviewAnalyzer, concurrency=N, batch_size=B)``."""

    def __init__(self):
        self._model = self._load_model()  # once per actor (T6)
        self._entity_re = re.compile(r"\b[A-Z][a-z]{2,}\b")

    @staticmethod
    def _load_model():
        # Deterministic stand-in for the Comprehend client
        # (/root/reference/pkg/itemparser/analyzer.go:24-40). A real
        # deployment returns a loaded NLP pipeline here.
        def score(content: str) -> str:
            h = hashlib.md5(content.encode("utf-8")).digest()[0]
            return SENTIMENTS[h % 4]

        return score

    def _entities(self, text: str) -> list[str]:
        seen: dict[str, None] = {}
        for m in self._entity_re.findall(text):
            seen.setdefault(m)
        return list(seen)

    def __call__(self, batch: pa.Table) -> pa.Table:
        reviews_col = batch.column("reviews").to_pylist()
        enriched = []
        for reviews in reviews_col:
            out = []
            for r in reviews or []:
                out.append(
                    {
                        **r,
                        "sentiment": self._model(r["content"]),
                        "entities": self._entities(
                            f"{r['title']} {r['content']}"
                        ),
                    }
                )
            enriched.append(out)
        idx = batch.schema.get_field_index("reviews")
        return batch.set_column(
            idx, pa.field("reviews", pa.list_(ENRICHED_REVIEW_TYPE)),
            pa.array(enriched, type=pa.list_(ENRICHED_REVIEW_TYPE)),
        )
