"""Frozen golden hash of the extraction pipeline's output on the seeded
corpus — the cross-round drift detector for the north-rule invariant
(span-sequence equality is only meaningful if the semantics are stable).

If this fails after an INTENTIONAL semantics change (extractor thresholds,
parser conformance fix), recompute with the command in the assert message
and update both the constant and the change log below.

Change log:
- r1: initial freeze (classifier v1, scripting-on parser).
"""

import hashlib
import json

from datagen.interleaved import make_corpus
from sparkhtml.extract import extract_spans

GOLDEN_SHA256 = "b078771b56c4a81b13bbf0ee4193ec9b801999e3f356aaa31223be69a52d60ed"


def test_extraction_golden_corpus():
    h = hashlib.sha256()
    for doc in make_corpus(200):
        out = extract_spans(doc["spans"])
        h.update(
            json.dumps([doc["doc_id"], out], sort_keys=True,
                       ensure_ascii=True).encode()
        )
    assert h.hexdigest() == GOLDEN_SHA256, (
        "extraction semantics drifted; if intentional, recompute via "
        "`python -c \"import tests.test_golden as g; g.recompute()\"` "
        f"got {h.hexdigest()}"
    )


def recompute() -> str:
    h = hashlib.sha256()
    for doc in make_corpus(200):
        out = extract_spans(doc["spans"])
        h.update(
            json.dumps([doc["doc_id"], out], sort_keys=True,
                       ensure_ascii=True).encode()
        )
    print(h.hexdigest())
    return h.hexdigest()
