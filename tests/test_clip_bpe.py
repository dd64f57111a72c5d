"""In-repo CLIP byte-level BPE tokenizer (utils/clip_bpe.py).

The strongest available check without the released vocab assets: generate a
synthetic-but-complete vocab (all 512 byte tokens + merges + specials) in the
HF on-disk schema, then compare our tokenizer token-for-token against HF's
``CLIPTokenizer`` loaded OFFLINE from those same files — that pins the whole
algorithm (cleaning, regex split, BPE merge order, specials, truncation,
padding) to the implementation the reference uses
(pipeline_upscale_a_video.py:65,231-240)."""

import json
import os

import numpy as np
import pytest

from upscale_a_video_tpu.utils.clip_bpe import (
    CLIPBPETokenizer,
    bytes_to_unicode,
    load_clip_tokenizer,
)

MERGES = [
    ("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>"),
    ("i", "n"), ("in", "g</w>"), ("h", "e"), ("a", "n"), ("an", "d</w>"),
    ("o", "o"), ("d", "oo"), ("doo", "r</w>"), ("e", "r</w>"),
]


def _build_vocab():
    """All single-byte tokens (+'</w>' forms), then merge outputs, then
    specials — the OpenAI vocab ordering convention."""
    vocab = list(bytes_to_unicode().values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in MERGES]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    return {tok: i for i, tok in enumerate(vocab)}


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(_build_vocab(), f, ensure_ascii=False)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in MERGES:
            f.write(f"{a} {b}\n")
    return str(d)


@pytest.fixture(scope="module")
def tok(tok_dir):
    return load_clip_tokenizer(tok_dir)


def test_basic_encode_decode(tok):
    ids = tok.encode("the cat")
    assert ids == [tok.encoder["the</w>"], tok.encoder["cat</w>"]]
    assert tok.decode(ids) == "the cat"


def test_merge_order_is_rank_driven(tok):
    # 'door': d+oo requires oo first (rank 9), then d+oo (10), then +r</w>
    assert tok.encode("door") == [tok.encoder["door</w>"]]
    # 'her': h+e merges (rank 6), r</w> has e+r</w> (rank 12) blocked because
    # 'he' already consumed the e → tokens are 'he' + 'r</w>'
    assert tok.encode("her") == [tok.encoder["he"], tok.encoder["r</w>"]]


def test_cleaning_and_case(tok):
    a = tok.encode("The   CAT")
    b = tok.encode("the cat")
    assert a == b


def test_call_shape_padding_truncation(tok):
    out = tok(["the cat", ""])
    assert out.shape == (2, 77) and out.dtype == np.int32
    assert out[0, 0] == tok.sot_id and out[1, 0] == tok.sot_id
    assert out[1, 1] == tok.eot_id          # empty prompt: eot right after sot
    assert (out[:, -1] == tok.eot_id).all()
    long = tok(["cat " * 200])
    assert long.shape == (1, 77)
    assert long[0, -1] == tok.eot_id        # truncated to 75 + specials


def test_unicode_bytes_roundtrip(tok):
    # no merges for these — pure byte fallback must still round-trip
    s = "héllo ☃"
    assert tok.decode(tok.encode(s)) == s


def test_openai_gz_schema(tok, tmp_path):
    import gzip

    lines = ["bpe header"] + [f"{a} {b}" for a, b in MERGES]
    # pad to the slice length upstream reads (49152-256-2 merges)
    lines += ["¡x ¡y"] * (49152 - 256 - 2 - len(MERGES))
    gz = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    t2 = load_clip_tokenizer(str(tmp_path))
    assert t2.encode("the cat")[0] == t2.encoder["the</w>"]
    assert t2.sot_id == 49406 and t2.eot_id == 49407  # real CLIP ids


def test_missing_assets_raise(tmp_path):
    with pytest.raises(FileNotFoundError, match="tokenizer assets"):
        load_clip_tokenizer(str(tmp_path))


class TestHFParity:
    """Token-for-token parity vs transformers' CLIPTokenizer loaded from the
    SAME local files (offline — no hub access)."""

    @pytest.fixture(scope="class")
    def hf(self, tok_dir):
        from transformers import CLIPTokenizer

        return CLIPTokenizer(
            vocab_file=os.path.join(tok_dir, "vocab.json"),
            merges_file=os.path.join(tok_dir, "merges.txt"),
        )

    PROMPTS = [
        "the cat",
        "The CAT and the door!!",
        "it's 42 cats, isn't it?",
        "multi    space\tand\nnewlines",
        "punctuation: #@$%^&*() -- ...",
        "unicode héllo ☃ 你好",
        "",
        "cat " * 120,  # truncation path
        "doors opening, doors closing, herding cats",
        "control\x00chars\x7fhere",
        "mixed CJK 猫the cat好",
        "accents: café naïve",
    ]

    def test_ids_match_hf(self, tok, hf):
        for p in self.PROMPTS:
            ours = tok([p])[0]
            theirs = hf([p], padding="max_length", max_length=77,
                        truncation=True, return_tensors="np")["input_ids"][0]
            np.testing.assert_array_equal(
                ours, theirs.astype(np.int32), err_msg=f"prompt={p!r}")

    def test_single_token_encode_matches(self, tok, hf):
        for p in self.PROMPTS:
            assert tok.encode(p) == hf.encode(p, add_special_tokens=False), p
