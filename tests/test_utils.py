"""Tokenizer / angle-feature / misc unit tests (the Python-level coverage
the reference lacks; SURVEY.md section 4)."""

import math

import numpy as np
import pytest

from dasa_tpu.utils import (
    PAD_IDX,
    Tokenizer,
    all_point_angle_feature,
    angle_feature,
    build_vocab,
    length2mask,
    point_angle_feature,
)
from dasa_tpu.utils.vocab import BASE_VOCAB, split_sentence


def test_split_sentence():
    assert split_sentence("Walk past the sofa, then stop.") == [
        "walk", "past", "the", "sofa", ",", "then", "stop", "."]
    # punctuation runs split to chars except multi-dots (utils.py:170-175)
    assert split_sentence("what?! ok..") == ["what", "?", "!", "ok", ".."]


def test_tokenizer_roundtrip():
    vocab = BASE_VOCAB + ["walk", "to", "the", "door"]
    tok = Tokenizer(vocab, encoding_length=10)
    assert tok.vocab_size() == len(vocab) + 1  # +<BOS>
    enc = tok.encode_sentence("walk to the door")
    assert enc.shape == (10,)
    assert enc[0] == tok.word_to_index["<BOS>"]
    assert enc[5] == tok.word_to_index["<EOS>"]
    assert (enc[6:] == PAD_IDX).all()
    assert tok.decode_sentence(enc) == "<BOS> walk to the door <EOS>"
    assert list(tok.shrink(list(enc))) == [tok.word_to_index[w]
                                           for w in ["walk", "to", "the", "door"]]


def test_tokenizer_truncation_eos():
    tok = Tokenizer(BASE_VOCAB + ["a"], encoding_length=4)
    enc = tok.encode_sentence("a a a a a a")
    assert enc.shape == (4,)
    assert enc[-1] == tok.word_to_index["<EOS>"]  # EOS overwrite at cut


def test_tokenizer_empty_returns_none():
    tok = Tokenizer(BASE_VOCAB, encoding_length=5)
    assert tok.encode_sentence("") is None


def test_unknown_words_map_to_unk():
    tok = Tokenizer(BASE_VOCAB + ["walk"], encoding_length=6)
    enc = tok.encode_sentence("walk zebra")
    assert enc[2] == tok.word_to_index["<UNK>"]


def test_build_vocab_min_count():
    data = [{"instructions": ["walk walk walk", "run walk"]}]
    vocab = build_vocab(data, min_count=2)
    assert "walk" in vocab and "run" not in vocab


def test_angle_feature_tiling():
    f = angle_feature(math.pi / 2, 0.0, angle_feat_size=8)
    assert f.shape == (8,)
    np.testing.assert_allclose(f[:4], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(f[:4], f[4:], atol=1e-7)


def test_point_angle_feature_table():
    """Closed form must match the definition from driving a simulator
    through the 36 views (utils.py:386-408): view ix has heading
    (ix%12)*30deg and elevation (ix//12-1)*30deg."""
    t = point_angle_feature(base_view_id=3, angle_feat_size=4)
    assert t.shape == (36, 4)
    for ix in [0, 7, 12, 23, 35]:
        h = (ix % 12) * math.radians(30) - 3 * math.radians(30)
        e = (ix // 12 - 1) * math.radians(30)
        np.testing.assert_allclose(
            t[ix], [math.sin(h), math.cos(h), math.sin(e), math.cos(e)],
            atol=1e-6)
    allt = all_point_angle_feature(4)
    assert allt.shape == (36, 36, 4)
    np.testing.assert_allclose(allt[3], t)


def test_length2mask():
    m = length2mask([1, 3, 2], size=4)
    expected = np.array([
        [False, True, True, True],
        [False, False, False, True],
        [False, False, True, True],
    ])
    np.testing.assert_array_equal(m, expected)
