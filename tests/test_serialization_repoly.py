import pytest


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-repoly", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_repolygonize_roundtrip(spark):
    """Serialize a real extraction to ALTO, run repolygonize against the
    source pages, and assert the recomputed boundaries are ink envelopes
    that enclose every baseline while the document stays re-parseable with
    identical text."""
    import pyspark.sql.functions as F

    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.kernels.xmlparse import parse_segmentation
    from kraken_spark.operators.serialization import (
        repolygonize_xml,
        serialize_extractions,
    )
    from kraken_spark.pipeline import plan_extraction

    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2)
    alto = serialize_extractions(ext, "alto").select("url", "document")
    pages = alto.join(docs.select("url", "html"), "url")
    got = repolygonize_xml(pages).collect()
    assert len(got) == 4
    for r in got:
        assert r.fmt == "alto" and r.n_lines > 0
        seg = parse_segmentation(r.document.encode("utf-8"))
        assert len(seg["lines"]) == r.n_lines
        for ln in seg["lines"]:
            bnd = ln["boundary"]
            assert bnd, "line lost its boundary"
            xs = [p[0] for p in bnd]
            ys = [p[1] for p in bnd]
            for x, y in ln["baseline"]:
                assert min(xs) - 8 <= x <= max(xs) + 8
                assert min(ys) - 24 <= y <= max(ys) + 8
    # text survives byte-identical through the repolygonized document
    texts0 = {r.url: [l["text"] for l in parse_segmentation(r.document.encode()).get("lines", [])]
              for r in alto.collect()}
    texts1 = {r.url: [l["text"] for l in parse_segmentation(r.document.encode()).get("lines", [])]
              for r in got}
    assert texts0 == texts1


def test_repolygonize_pagexml(spark):
    """Same pass over PageXML input: format auto-detected and preserved."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.kernels.xmlparse import parse_segmentation
    from kraken_spark.operators.serialization import (
        repolygonize_xml,
        serialize_extractions,
    )
    from kraken_spark.pipeline import plan_extraction

    docs = generate_corpus_df(spark, 2).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2)
    px = serialize_extractions(ext, "pagexml").select("url", "document")
    got = repolygonize_xml(px.join(docs.select("url", "html"), "url")).collect()
    assert {r.fmt for r in got} == {"pagexml"} and len(got) == 2
    for r in got:
        seg = parse_segmentation(r.document.encode("utf-8"))
        assert len(seg["lines"]) == r.n_lines > 0
        assert all(ln["boundary"] for ln in seg["lines"])
