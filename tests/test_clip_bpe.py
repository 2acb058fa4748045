"""CLIP BPE tokenizer: merge algorithm, roundtrip, and the reference padding
contract (prior.py:394-416), using a synthetic merges table."""

import gzip

import numpy as np
import pytest

from kandinsky2_tpu.tokenizers import CLIPBPETokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    # synthetic merges: enough to exercise multi-step merging
    merges = [
        "#version: 0.2",
        "h e", "l l", "he ll", "hell o</w>", "w o", "wo r", "wor l",
        "worl d</w>", "c a", "ca t</w>",
    ]
    # pad to the expected merge-count window
    while len(merges) < 10 + 1:
        merges.append("x y")
    path = tmp_path_factory.mktemp("bpe") / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n" + "\n".join(["q q"] * 5))
    return CLIPBPETokenizer(str(path))


def test_encode_merges(tok):
    ids = tok.encode("hello world cat")
    # 'hello' -> single merged token, ends with </w>
    toks = [tok.decoder[i] for i in ids]
    assert toks[0] == "hello</w>"
    assert toks[-1] == "cat</w>"


def test_roundtrip(tok):
    text = "hello cat"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_padding_contract(tok):
    toks, mask = tok.padded_tokens_and_mask(["hello", ""], 6)
    assert toks.shape == (2, 6) and mask.shape == (2, 6)
    assert toks[0, 0] == tok.sot_token
    assert tok.eot_token in toks[0]
    # empty prompt: sot + eot only
    assert mask[1].sum() == 2
    # truncation keeps eot last (prior.py:411-414)
    long_toks, long_mask = tok.padded_tokens_and_mask(
        ["hello world cat hello world cat hello world"], 5
    )
    assert long_toks[0, -1] == tok.eot_token
    assert long_mask[0].all()


def test_unicode_bytes(tok):
    ids = tok.encode("héllo ✨")
    assert all(isinstance(i, int) or np.issubdtype(type(i), np.integer) for i in ids)
    assert len(ids) > 0


def test_textfix_mojibake_repair(tok):
    """Without ftfy, mojibake prompts must tokenize identically to their
    clean forms (reference routes prompts through ftfy.fix_text)."""
    from kandinsky2_tpu.tokenizers.textfix import fix_text

    cases = [
        ("LÃ³pez", "López"),
        ("Ã©tÃ©", "été"),
        ("âœ” ok", "✔ ok"),
        ("CafÃƒÂ©", "Café"),  # double-encoded
        ("não", "não"),                      # legit text untouched
        ("plain ascii", "plain ascii"),
    ]
    for src, want in cases:
        assert fix_text(src) == want, (src, fix_text(src), want)
    # end to end through the tokenizer: same ids for mojibake vs clean
    assert tok.encode("LÃ³pez") == tok.encode("López")
