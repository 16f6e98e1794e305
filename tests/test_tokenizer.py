"""WordPiece tokenizer: parity vs transformers.BertTokenizer on a synthetic
vocab, plus the LAVT pad/truncate contract."""

import numpy as np
import pytest

from lavt_rs_tpu.text.tokenizer import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "dog", "cat", "on", "left", "right", "man", "in",
         "red", "shirt", "##s", "##ing", "run", "jump", "a", ",", ".",
         "um", "##bre", "##lla", "girl", "hold"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer.from_vocab_file(str(p))


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    from transformers import BertTokenizer

    p = tmp_path_factory.mktemp("hfvocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


SENTS = [
    "the dog on the left",
    "Man in RED shirt, running.",
    "a girl holding an umbrella",
    "cats jumping",
    "zzzz unknown wordzz",
    "  extra   spaces\tand\nnewlines  ",
]


def test_matches_hf_tokenizer(tok, hf_tok):
    for s in SENTS:
        got = tok.encode(s)
        want = hf_tok.encode(s, add_special_tokens=True)
        assert got == want, f"{s!r}: {got} != {want}"


def test_encode_padded_contract(tok):
    ids, mask = tok.encode_padded("the dog on the left", max_tokens=20)
    assert ids.shape == (20,) and mask.shape == (20,)
    n = mask.sum()
    assert ids[0] == tok.cls_id and ids[n - 1] == tok.sep_id
    assert (ids[n:] == 0).all() and (mask[n:] == 0).all()


def test_encode_padded_truncation(tok):
    long = " ".join(["the dog"] * 30)
    ids, mask = tok.encode_padded(long, max_tokens=20)
    assert mask.sum() == 20
    # truncation keeps the first 20 ids (reference crops AFTER special
    # tokens are added, so [SEP] may be cut — mirror that)
    assert ids[0] == tok.cls_id
    assert ids[-1] != tok.sep_id


def test_resolve_vocab_fallbacks(tmp_path):
    """--vocab wins when present; --bert_tokenizer may name a vocab.txt or
    a directory containing one (the reference passes it to
    BertTokenizer.from_pretrained, data/a2d.py:48)."""
    from lavt_rs_tpu.text.tokenizer import resolve_vocab

    v = tmp_path / "vocab.txt"
    v.write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\n")
    assert resolve_vocab(str(v), "bert-base-uncased") == str(v)
    # fallback: --bert_tokenizer as a direct file
    assert resolve_vocab(str(tmp_path / "missing.txt"), str(v)) == str(v)
    # fallback: --bert_tokenizer as a tokenizer directory
    assert resolve_vocab("", str(tmp_path)) == str(v)
    with pytest.raises(FileNotFoundError):
        resolve_vocab(str(tmp_path / "missing.txt"), "bert-base-uncased")
