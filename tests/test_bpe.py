"""In-repo-trained BPE tokenizer (kernels/bpe.py): the published algorithm
(Sennrich et al. 2016) on its own paper example, asset reproducibility,
decode round-trips, subword splits on unseen words, and the Arrow-batched
Spark face's parity with the pure-Python kernel.
"""

import json
from pathlib import Path

import pytest

from kraken_spark.kernels.bpe import (
    BPE,
    EOW,
    load_merges,
    save_merges,
    train_bpe,
)

ASSET = Path(__file__).resolve().parent.parent / "kraken_spark" / "assets" / "bpe_merges.json"


def test_sennrich_paper_example():
    """The ACL-2016 running example: corpus {low x5, lower x2, newest x6,
    widest x3}. ('e','s') and ('s','t</w>') tie at frequency 9; the
    deterministic lexicographic tie-break picks ('e','s') — the paper's
    own first merge — then ('es','t</w>')."""
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    merges = train_bpe([" ".join(corpus)], n_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)
    b = BPE(merges)
    # after 4 merges 'newest' ends in the 'est</w>' unit
    assert "est" + EOW in b.encode("newest")


def test_asset_reproducible():
    """tools/train_bpe.py output is bit-for-bit reproducible from the
    deterministic sf0.001 testdata."""
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train_bpe(texts, n_merges=512)
    assert [list(m) for m in merges] == json.loads(ASSET.read_text())


def test_decode_roundtrip_and_counts():
    b = BPE(load_merges(str(ASSET)))
    for text in [
        "the table query sort merge window filter",
        "spark group row data slow small filter customer line",
        "",
        "zzzunseen wordzz the",
    ]:
        toks = b.encode(text)
        assert b.decode(toks) == " ".join(text.lower().split())
        assert b.count(text) == len(toks)


def test_unseen_words_split_to_subwords():
    b = BPE(load_merges(str(ASSET)))
    # in-vocabulary corpus words are fully merged: one token per word
    assert b.count("the table query") == 3
    # an unseen word costs multiple subword tokens
    assert len(b._encode_word("xylophone")) > 1


def test_save_load_roundtrip(tmp_path):
    merges = [("a", "b"), ("ab", "c" + EOW)]
    p = tmp_path / "m.json"
    save_merges(str(p), merges)
    assert load_merges(str(p)) == merges


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-bpe", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_spark_face_parity(spark):
    from kraken_spark.functions.text import bpe_token_counts, t

    docs = t(spark, "/root/testdata/sf0.001").limit(40)
    got = {r.doc_id: (r.bpe_tokens, r.words) for r in bpe_token_counts(docs).collect()}
    b = BPE(load_merges(str(ASSET)))
    for row in docs.select("doc_id", "text").collect():
        assert got[row.doc_id] == (b.count(row.text or ""), len((row.text or "").split()))


def test_bpe_roundtrip_property():
    """decode(encode(x)) == whitespace-normalized lowercase x for arbitrary
    text — the tokenizer never loses or invents characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kraken_spark.kernels.bpe import BPE, load_merges

    b = BPE(load_merges(str(ASSET)))

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def prop(text):
        toks = b.encode(text)
        assert b.decode(toks) == " ".join(text.lower().split())
        assert b.count(text) == len(toks)

    prop()
