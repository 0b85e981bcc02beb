"""Tokenizer parity vs golden ids from the reference SimpleTokenizer.

Goldens produced by `tests/gen_golden_tokens.py` running the reference
implementation (`src/open_clip/tokenizer.py:133-265`) as oracle.
"""

import json
import os

import numpy as np
import pytest

from mrclip_tpu.tokenizer import HFTokenizer, SimpleTokenizer, decode, tokenize

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tokens.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def test_vocab_and_specials(tok, golden):
    assert tok.vocab_size == golden["vocab_size"] == 49408
    assert tok.sot_token_id == golden["sot"]
    assert tok.eot_token_id == golden["eot"]
    assert tok.context_length == golden["context_length"] == 98


def test_encode_parity(tok, golden):
    for cap, want in zip(golden["captions"], golden["encode"]):
        assert tok.encode(cap) == want


def test_call_parity(tok, golden):
    for cap, want in zip(golden["captions"], golden["tokens"]):
        got = tok([cap])
        assert got.dtype == np.int32
        assert got.shape == (1, 98)
        assert got[0].tolist() == want


def test_batch_shape(tok):
    out = tok(["a", "b", "c"], context_length=77)
    assert out.shape == (3, 77)
    assert (out[:, 0] == tok.sot_token_id).all()


def test_truncation_forces_eot(tok):
    out = tok(["word " * 500])[0]
    assert out[-1] == tok.eot_token_id


def test_roundtrip(tok):
    text = "a photo of a cat"
    ids = tok.encode(text)
    assert decode(ids).strip() == text


def test_module_level_tokenize():
    out = tokenize("hello world")
    assert out.shape == (1, 98)


def test_reduction_simple():
    tok = SimpleTokenizer(reduction_mask="simple")
    out = tok(["word " * 500])
    assert out.shape == (1, 98)
    assert out[0, 0] == tok.sot_token_id
    assert out[0, -1] == tok.eot_token_id


def test_reduction_random():
    np.random.seed(0)
    tok = SimpleTokenizer(reduction_mask="random")
    out = tok(["word " * 500])
    assert out.shape == (1, 98)
    assert out[0, -1] == tok.eot_token_id
