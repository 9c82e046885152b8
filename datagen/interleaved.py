"""Deterministic generator for the interleaved text+media document corpus.

Shape per ``BASELINE.json.input_hint`` / FIXTURES.md F1:

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

Everything is derived from a seeded ``random.Random`` — same seed, same
corpus, any scale. Text spans exercise the parser's hard paths: boilerplate
nav/footer (high link density), headings/lists/tables, mis-nested
formatting (adoption agency), ``<pre>`` leading newline, entities
(named/numeric/semicolonless), comments, doctype-less fragments, SVG/MathML
islands; a configurable pathological stratum gets deep nesting + huge text
runs (skew testing).
"""

from __future__ import annotations

import random

_WORDS = (
    "the quick brown fox jumps over lazy dog data stream spark engine "
    "document content article section heading paragraph extraction main "
    "boiler plate nav footer menu link table row cell list item pretty "
    "format nested entity escape sample corpus deterministic generator"
).split()

_ENTITIES = ["&amp;", "&hellip;", "&#169;", "&#x2014;", "&nbsp;", "&copy", "&notin;"]


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _nav_block(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/p{rng.randrange(100)}">{rng.choice(_WORDS)}</a> '
        for _ in range(rng.randrange(3, 8))
    )
    return f"<nav>{links}</nav>"


def _footer_block(rng: random.Random) -> str:
    return f"<footer>&copy; 2026 {rng.choice(_WORDS)} corp</footer>"


def _content_block(rng: random.Random) -> str:
    kind = rng.randrange(7)
    if kind == 0:
        return f"<h2>{_sentence(rng, rng.randrange(2, 6))}</h2>"
    if kind == 1:
        ent = rng.choice(_ENTITIES) if rng.random() < 0.3 else ""
        return f"<p>{_sentence(rng, rng.randrange(8, 30))} {ent}</p>"
    if kind == 2:
        items = "".join(
            f"<li>{_sentence(rng, rng.randrange(3, 9))}" for _ in range(rng.randrange(2, 6))
        )
        return f"<ul>{items}</ul>"
    if kind == 3:
        cells = "".join(
            f"<td>{_sentence(rng, rng.randrange(2, 6))}</td>"
            for _ in range(rng.randrange(2, 4))
        )
        return f"<table><tr>{cells}</tr></table>"
    if kind == 4:
        # mis-nested formatting → adoption agency
        return (
            f"<p><b>{_sentence(rng, 4)}<i>{_sentence(rng, 4)}</b>"
            f"{_sentence(rng, 4)}</i> {_sentence(rng, rng.randrange(4, 10))}</p>"
        )
    if kind == 5:
        return f"<pre>\n{_sentence(rng, rng.randrange(5, 12))}</pre>"
    return (
        f"<!-- {rng.choice(_WORDS)} --><p>{_sentence(rng, rng.randrange(6, 20))}"
        f"<svg><title>{rng.choice(_WORDS)}</title></svg></p>"
    )


def make_text_span(rng: random.Random, pathological: bool = False) -> str:
    if pathological:
        depth = rng.randrange(600, 2000)
        return (
            "<div>" * depth
            + f"<p>{_sentence(rng, 2000)}</p>"
            + "</div>" * depth
        )
    blocks = [_content_block(rng) for _ in range(rng.randrange(1, 5))]
    if rng.random() < 0.4:
        blocks.insert(0, _nav_block(rng))
    if rng.random() < 0.3:
        blocks.append(_footer_block(rng))
    return "".join(blocks)


def make_doc(doc_index: int, seed: int = 42, pathological_rate: float = 0.001) -> dict:
    rng = random.Random((seed << 32) ^ doc_index)
    pathological = rng.random() < pathological_rate
    n_spans = rng.randrange(1, 17)
    spans = []
    media_k = 0
    for off in range(n_spans):
        if rng.random() < 0.25:
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"m-{doc_index}-{media_k}",
                    "offset": off,
                }
            )
            media_k += 1
        else:
            spans.append(
                {
                    "kind": "text",
                    "text": make_text_span(rng, pathological and off == 0),
                    "media_ref": None,
                    "offset": off,
                }
            )
    return {"doc_id": f"doc-{doc_index:012d}", "spans": spans}


def make_corpus(n_docs: int, seed: int = 42, pathological_rate: float = 0.001):
    """Yield ``n_docs`` deterministic documents."""
    for i in range(n_docs):
        yield make_doc(i, seed, pathological_rate)
