"""Tokenizer conformance against html5lib-format JSON fixtures.

Harness mirrors the reference's HTMLTokenizerTests.m: adjacent Character
tokens coalesced before compare (:163-207 concatenateCharacterTokens),
parse errors compared by count only (:165-181), initialStates ×
lastStartTag matrix (:138-161).
"""

import glob
import json
import os

import pytest

from sparkhtml.tokenizer import STATE_NAMES, Tokenizer

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "tokenizer"
)


def _load_cases():
    cases = []
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.test"))):
        suite = os.path.basename(path)
        data = json.load(open(path))
        for i, case in enumerate(data["tests"]):
            for state in case.get("initialStates", ["Data state"]):
                cases.append(
                    pytest.param(
                        case, state, id=f"{suite}:{i}:{case['description']}:{state}"
                    )
                )
    return cases


def _expected(case):
    tokens = []
    n_errors = 0
    for t in case["output"]:
        if t[0] == "ParseError":
            n_errors += 1
        else:
            tokens.append(t)
    return _coalesce(tokens), n_errors


def _coalesce(tokens):
    out = []
    for t in tokens:
        if t[0] == "Character" and out and out[-1][0] == "Character":
            out[-1] = ["Character", out[-1][1] + t[1]]
        else:
            out.append(list(t))
    return [t for t in out if not (t[0] == "Character" and t[1] == "")]


def _actual(case, state):
    tok = Tokenizer(
        case["input"],
        state=STATE_NAMES[state],
        last_start_tag=case.get("lastStartTag"),
    )
    tokens = []
    for t in tok.tokens():
        tt = t[0]
        if tt == "Character":
            tokens.append(["Character", t[1]])
        elif tt == "StartTag":
            row = ["StartTag", t[1], dict(t[2])]
            if t[3]:
                row.append(True)
            tokens.append(row)
        elif tt == "EndTag":
            tokens.append(["EndTag", t[1]])
        elif tt == "Comment":
            tokens.append(["Comment", t[1]])
        elif tt == "DOCTYPE":
            tokens.append(["DOCTYPE", t[1], t[2], t[3], not t[4]])
    return _coalesce(tokens), len(tok.errors)


@pytest.mark.parametrize("case,state", _load_cases())
def test_tokenizer_case(case, state):
    exp_tokens, exp_errors = _expected(case)
    got_tokens, got_errors = _actual(case, state)
    assert got_tokens == exp_tokens, (
        f"input={case['input']!r}\nexpected={exp_tokens}\ngot={got_tokens}"
    )
    assert got_errors == exp_errors, (
        f"input={case['input']!r}: expected {exp_errors} parse errors, "
        f"got {got_errors}"
    )
