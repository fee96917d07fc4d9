"""Codec parity with the reference's own test vectors (test_codec.py:17-344):
one/many-to-one/many encodes and decodes (per-code-point emission with
whole-match extents and mean confidences), strict/non-strict invalid
handling, and the add_labels / merge vocabulary-surgery semantics."""

import pytest

from kraken_spark.kernels.codec import Codec, CodecError

VALID = "aaababbaaabbbb"
INVALID = "aaababbcaaa"
ADA = "cdaabae"
INVALID_L = [(45, 78, 778, 0.3793492615638364),
             (10, 203, 859, 0.9485075253700872),
             (11, 70, 601, 0.7885297329523855),
             (12, 251, 831, 0.7216817042926938),
             (900, 72, 950, 0.27609823017048707)]


@pytest.fixture
def o2o():
    return Codec("ab")


@pytest.fixture
def m2o():
    return Codec(["aaa", "aa", "a", "b"])


@pytest.fixture
def o2m():
    return Codec({"a": [10, 11, 12], "b": [12, 45, 80]})


@pytest.fixture
def m2m():
    return Codec({"aaa": [10, 11, 12], "aa": [9, 9], "a": [11],
                  "bb": [15], "b": [12]})


def test_encodes(o2o, m2o, o2m, m2m):
    assert o2o.encode(VALID) == [1, 1, 1, 2, 1, 2, 2, 1, 1, 1, 2, 2, 2, 2]
    assert m2o.encode(VALID) == [3, 4, 1, 4, 4, 3, 4, 4, 4, 4]
    assert o2m.encode(VALID) == [10, 11, 12] * 3 + [12, 45, 80] + \
        [10, 11, 12] + [12, 45, 80] * 2 + [10, 11, 12] * 3 + [12, 45, 80] * 4
    assert m2m.encode(VALID) == [10, 11, 12, 12, 11, 15, 10, 11, 12, 15, 15]


def test_encode_invalid_nonstrict(o2o, m2o, o2m, m2m):
    assert o2o.encode(INVALID) == [1, 1, 1, 2, 1, 2, 2, 1, 1, 1]
    assert m2o.encode(INVALID) == [3, 4, 1, 4, 4, 3]
    assert o2m.encode(INVALID) == [10, 11, 12] * 3 + [12, 45, 80] + \
        [10, 11, 12] + [12, 45, 80] * 2 + [10, 11, 12] * 3
    assert m2m.encode(INVALID) == [10, 11, 12, 12, 11, 15, 10, 11, 12]


def test_encode_invalid_strict():
    for cs in ("ab", ["aaa", "aa", "a", "b"],
               {"a": [10, 11, 12], "b": [12, 45, 80]},
               {"aaa": [10, 11, 12], "aa": [9, 9], "a": [11],
                "bb": [15], "b": [12]}):
        with pytest.raises(CodecError):
            Codec(cs, strict=True).encode(INVALID)


def test_decode_roundtrip_text(o2o, m2o, o2m, m2m):
    """Decoding the encode of the valid sequence restores the text, one
    tuple per code point."""
    for c in (o2o, m2o, o2m):
        labs = [(l, i, i + 1, 0.5) for i, l in enumerate(c.encode(VALID))]
        assert "".join(x[0] for x in c.decode(labs)) == VALID
    labs = [(l, i, i + 1, 0.5) for i, l in enumerate(m2m.encode(VALID))]
    assert "".join(x[0] for x in m2m.decode(labs)) == VALID


def test_m2m_decode_reference_vector(m2m):
    """The reference's hand-picked m2m label stream (test_codec.py:158-172):
    the lone 10 at index 4 is undecodable and skipped, yielding
    'aaabbbaaabbbb'."""
    labs = [(l, 0, 1, 0.5) for l in
            (10, 11, 12, 12, 10, 15, 10, 11, 12, 15, 15)]
    assert "".join(x[0] for x in m2m.decode(labs)) == "aaabbbaaabbbb"


def test_decode_invalid_nonstrict(o2o, m2o, o2m, m2m):
    assert o2o.decode(INVALID_L) == []
    assert m2o.decode(INVALID_L) == []
    # (10,11,12) inside the garbage decodes to 'a' spanning first-start to
    # last-end with mean confidence (test_codec.py:187-201)
    assert o2m.decode(INVALID_L) == [("a", 203, 831, 0.8195729875383888)]
    assert m2m.decode(INVALID_L) == [("a", 203, 831, 0.8195729875383888)] * 3


def test_decode_invalid_strict():
    for cs in ("ab", ["aaa", "aa", "a", "b"],
               {"a": [10, 11, 12], "b": [12, 45, 80]},
               {"aaa": [10, 11, 12], "aa": [9, 9], "a": [11],
                "bb": [15], "b": [12]}):
        with pytest.raises(CodecError):
            Codec(cs, strict=True).decode(INVALID_L)


def test_add_labels(o2o):
    prev = len(o2o)
    c = o2o.add_labels("cde")
    assert len(c) == prev + 3
    assert c.encode(ADA) == [3, 4, 1, 1, 2, 1, 5]
    c = o2o.add_labels(["cd", "e"])
    assert len(c) == prev + 2
    assert c.encode(ADA) == [3, 1, 1, 2, 1, 4]
    c = o2o.add_labels({"cd": [3], "e": [4]})
    assert len(c) == prev + 2
    assert c.encode(ADA) == [3, 1, 1, 2, 1, 4]


def test_merge(o2o):
    new, removed = o2o.merge(Codec("acde"))
    assert removed == {2}
    assert new.c2l == {"a": [1], "c": [2], "d": [3], "e": [4]}
    new, removed = o2o.merge(Codec("abcde"))
    assert removed == set()
    assert new.c2l == {"a": [1], "b": [2], "c": [3], "d": [4], "e": [5]}
    new, removed = o2o.merge(Codec("a"))
    assert removed == {2}
    assert new.c2l == {"a": [1]}
