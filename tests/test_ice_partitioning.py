"""Hidden partitioning on ice tables (icetable.append partition_by=...):
identity / days / bucket transforms, spec inheritance across appends,
layout-driven file skipping, and clustering-preserving maintenance.
"""

import datetime

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-part", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, lang string"
    )


TS = datetime.datetime


def test_identity_partitioning_clusters_and_prunes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = _pages(
        spark,
        [
            ("u1", TS(2024, 1, 1), "en"),
            ("u2", TS(2024, 1, 1), "fr"),
            ("u3", TS(2024, 1, 2), "en"),
        ],
    )
    it.append(df, t, partition_by=["lang"])
    man = it.snapshot(t)["manifest"]
    parts = {e["partition"] for e in man}
    assert parts == {"p_lang=en", "p_lang=fr"}
    # the original column stays IN the files; derived p_* never surfaces
    got = it.read(spark, t)
    assert got.columns == ["url", "warc_ts", "lang"]
    assert {(r.url, r.lang) for r in got.collect()} == {
        ("u1", "en"), ("u2", "fr"), ("u3", "en"),
    }
    # layout makes stats skipping selective: fr query touches no en file
    assert all(
        e["stats"]["lang"] == ["fr", "fr"]
        for e in it._prune_entries(man, {"lang": ("fr", "fr")})
    )
    assert {r.url for r in it.read(spark, t, where={"lang": ("fr", "fr")}).collect()} == {"u2"}


def test_spec_inheritance_and_days_transform(spark, tmp_path):
    """An append without a spec inherits the table's (Iceberg table-level
    spec) — a corpus tick keeps the dump layout without knowing it."""
    t = str(tmp_path / "tbl")
    it.append(
        _pages(spark, [("u1", TS(2024, 1, 1, 5), "en")]), t,
        partition_by=["days(warc_ts)"],
    )
    assert it.snapshot(t)["partition_spec"] == ["days(warc_ts)"]
    it.append(_pages(spark, [("u2", TS(2024, 6, 1, 9), "fr")]), t)  # no spec
    man = it.snapshot(t)["manifest"]
    assert {e["partition"] for e in man} == {
        "p_warc_ts_day=2024-01-01", "p_warc_ts_day=2024-06-01",
    }
    # crawl-window read prunes to the window's files
    w = {"warc_ts": (TS(2024, 5, 1), None)}
    assert len(it._prune_entries(man, w)) < len(man)
    assert {r.url for r in it.read(spark, t, where=w).collect()} == {"u2"}


def test_bucket_transform_and_bad_spec(spark, tmp_path):
    t = str(tmp_path / "tbl")
    rows = [(f"u{i}", TS(2024, 1, 1), "en") for i in range(12)]
    it.append(_pages(spark, rows), t, partition_by=["bucket(4, url)"])
    man = it.snapshot(t)["manifest"]
    assert all(e["partition"].startswith("p_url_b4=") for e in man)
    assert len({e["partition"] for e in man}) > 1  # actually spread
    assert it.read(spark, t).count() == 12
    with pytest.raises(ValueError, match="partition transform"):
        it.append(_pages(spark, rows[:1]), t, partition_by=["lower(url)"])


def test_maintenance_preserves_clustering(spark, tmp_path):
    """Compaction bin-packs WITHIN partitions and deletes rewrite within
    them — the clustering that makes skipping selective must survive."""
    t = str(tmp_path / "tbl")
    for day, urls in ((1, ["a", "b"]), (1, ["c"]), (2, ["d", "e"]), (2, ["f"])):
        it.append(
            _pages(spark, [(u, TS(2024, 1, day), "en") for u in urls]), t,
            partition_by=["days(warc_ts)"],
        )
    s = it.compact(spark, t, target_bytes=1 << 30)
    assert s is not None and s["rewritten_rows"] == 6
    man = it.snapshot(t)["manifest"]
    assert {e["partition"] for e in man} == {
        "p_warc_ts_day=2024-01-01", "p_warc_ts_day=2024-01-02",
    }
    # every file is still single-day (stats min == max per file)
    for e in man:
        lo, hi = e["stats"]["warc_ts"]
        assert lo[:10] == hi[:10]
    assert it.snapshot(t)["partition_spec"] == ["days(warc_ts)"]
    # a takedown rewrites only day-1 files, day-2 stays byte-untouched
    day2 = {e["path"] for e in man if "01-02" in e["partition"]}
    d = it.delete_where(
        spark, t, "url = 'a'",
        prune={"warc_ts": (TS(2024, 1, 1), TS(2024, 1, 1, 23))},
    )
    assert d["deleted_rows"] == 1
    man2 = it.snapshot(t)["manifest"]
    assert day2 <= {e["path"] for e in man2}
    assert {e["partition"] for e in man2} == {
        "p_warc_ts_day=2024-01-01", "p_warc_ts_day=2024-01-02",
    }
    assert {r.url for r in it.read(spark, t).collect()} == {"b", "c", "d", "e", "f"}
    # inheritance still intact after maintenance (head is a delete snap)
    it.append(_pages(spark, [("g", TS(2024, 1, 3), "en")]), t)
    assert any(
        e["partition"] == "p_warc_ts_day=2024-01-03"
        for e in it.snapshot(t)["manifest"]
    )


def test_partition_spec_evolution(spark, tmp_path):
    """Partition EVOLUTION (Iceberg: specs can change over a table's life):
    an explicit new spec on a later append re-clusters only NEW files; old
    files keep their recorded partition values, reads are unaffected,
    maintenance keeps grouping by each file's own partition, and
    inheritance follows the newest spec."""
    t = str(tmp_path / "tbl")
    it.append(
        _pages(spark, [("a", TS(2024, 1, 1), "en"), ("b", TS(2024, 1, 1), "de")]),
        t,
        partition_by=["lang"],
    )
    # evolve: cluster subsequent dumps by crawl day instead of language
    it.append(
        _pages(spark, [("c", TS(2024, 2, 1), "en"), ("d", TS(2024, 2, 2), "fr")]),
        t,
        partition_by=["days(warc_ts)"],
    )
    snap = it.snapshot(t)
    assert snap["partition_spec"] == ["days(warc_ts)"]
    parts = {e["partition"] for e in snap["manifest"] if e["rows"] > 0}
    assert {"p_lang=en", "p_lang=de"} <= parts  # old spec's files untouched
    assert any(p.startswith("p_warc_ts_day=2024-02") for p in parts)
    # reads see one logical table across both specs
    assert {r.url for r in it.read(spark, t).collect()} == {"a", "b", "c", "d"}
    # spec-less append inherits the NEWEST spec
    it.append(_pages(spark, [("e", TS(2024, 2, 3), "en")]), t)
    assert any(
        e["partition"] == "p_warc_ts_day=2024-02-03"
        for e in it.snapshot(t)["manifest"]
    )
    # maintenance groups by each file's OWN recorded partition: compaction
    # never merges across old-spec and new-spec clusters
    it.append(_pages(spark, [("f", TS(2024, 2, 3), "en")]), t)
    s = it.compact(spark, t, target_bytes=1 << 30)
    if s is not None:
        for e in it.snapshot(t)["manifest"]:
            assert e["partition"].startswith(("p_lang=", "p_warc_ts_day="))
    assert {r.url for r in it.read(spark, t).collect()} == {
        "a", "b", "c", "d", "e", "f",
    }
