"""The full corpus production loop (corpus_pipeline.corpus_tick): pages
delta -> extraction -> quality gate -> incremental near-dup vs the retained
corpus -> ONE atomic commit carrying text + minhash signatures + watermark.

The synthetic pages' ground-truth text is random glyph soup, which the
Gopher gate correctly rejects — so the dedup-mechanics e2e runs with
require_quality=False, and the gate itself is exercised separately on
constructed prose/junk.
"""

import pytest

from kraken_spark.corpus_pipeline import corpus_tick
from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-corpus-tick", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_two_ticks_with_incremental_dedup(spark, tmp_path):
    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    docs = generate_corpus_df(spark, 6).localCheckpoint(eager=True)

    # tick 1: first 4 pages
    first = docs.limit(4).localCheckpoint(eager=True)
    it.append(first, pages)
    r1 = corpus_tick(spark, pages, kept, run_id="t1", num_partitions=2,
                     require_quality=False)
    assert r1["extracted"] == 4 and r1["kept_new"] == 4 and r1["dropped_dup"] == 0
    state1 = it.read(spark, kept).collect()
    assert len(state1) == 4
    assert all(len(r.sig) == 16 and len(r.band_keys) == 4 for r in state1)

    # no-op tick: nothing new committed
    r_noop = corpus_tick(spark, pages, kept, run_id="tnoop", num_partitions=2,
                         require_quality=False)
    assert r_noop["out_snapshot_id"] is None
    assert it.current_snapshot_id(kept) == 1

    # tick 2: the remaining 2 fresh pages PLUS an exact recrawl of a kept
    # page under a NEW url — extraction text identical -> near-dup of the
    # retained corpus, must be dropped by the signature join
    import pyspark.sql.functions as F

    rest = docs.join(first.select("url"), "url", "left_anti")
    dup_of_kept = first.limit(1).withColumn(
        "url", F.concat(F.col("url"), F.lit("?recrawl=1"))
    )
    it.append(rest.union(dup_of_kept), pages)
    r2 = corpus_tick(spark, pages, kept, run_id="t2", num_partitions=2,
                     require_quality=False)
    assert r2["extracted"] == 3
    assert r2["kept_new"] == 2 and r2["dropped_dup"] == 1
    final = it.read(spark, kept).collect()
    assert len(final) == 6
    assert not any("recrawl" in r.url for r in final)
    # watermark + lineage ride the commit
    assert it.snapshot(kept, 2)["summary"]["source_snapshot_id"] == 2
    assert it.snapshot(kept, 2)["lineage"][0]["stage"] == "corpus-tick"


def test_within_delta_recrawl_collapses_to_latest(spark, tmp_path):
    """A url crawled twice WITHIN one delta must contribute exactly one
    kept row (latest warc_ts wins) — not multiply through the quality
    joins or blend one minhash signature across two texts."""
    import pyspark.sql.functions as F

    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    docs = generate_corpus_df(spark, 3).localCheckpoint(eager=True)
    first = docs.limit(1)
    recrawl = first.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    it.append(docs.union(recrawl), pages)
    r = corpus_tick(spark, pages, kept, run_id="rc", num_partitions=2,
                    require_quality=False)
    assert r["extracted"] == 3  # 4 delta rows -> 3 unique urls
    assert r["kept_new"] == 3
    state = it.read(spark, kept).collect()
    assert len(state) == 3
    assert len({row.url for row in state}) == 3


def test_concurrent_tick_loses_race_cleanly(spark, tmp_path, monkeypatch):
    """Two overlapping ticks over the same delta: the one whose commit
    lands second must abort via the append precondition (lost_race=True,
    nothing committed) instead of double-ingesting the delta."""
    import kraken_spark.corpus_pipeline as cp
    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    docs = generate_corpus_df(spark, 2).localCheckpoint(eager=True)
    it.append(docs, pages)

    # rival tick commits AFTER this tick read its watermark but BEFORE its
    # append: inject via the dedup stage (runs mid-tick, post-watermark)
    real = cp.dedup_incremental
    fired = {}

    def rival_then_real(*a, **kw):
        if not fired:
            fired["x"] = True
            it.append(
                spark.createDataFrame(
                    [("rival://u", "t", [1] * 16, ["b"] * 4)],
                    "url string, text string, sig array<bigint>, band_keys array<string>",
                ),
                kept,
                summary={"run_id": "rival", "source_snapshot_id": 1},
            )
        return real(*a, **kw)

    monkeypatch.setattr(cp, "dedup_incremental", rival_then_real)
    r = corpus_tick(spark, pages, kept, run_id="loser", num_partitions=2,
                    require_quality=False)
    assert r["lost_race"] and r["out_snapshot_id"] is None and r["kept_new"] == 0
    # only the rival's commit exists; the delta was NOT double-ingested
    assert it.current_snapshot_id(kept) == 1
    assert {row.url for row in it.read(spark, kept).collect()} == {"rival://u"}
    # and the next tick is a clean no-op (watermark already at head)
    r2 = corpus_tick(spark, pages, kept, run_id="after", num_partitions=2,
                     require_quality=False)
    assert r2["out_snapshot_id"] is None and not r2["lost_race"]


def test_takedown_between_ticks_preserves_loop(spark, tmp_path):
    """A merge-on-read takedown on the kept table between two ticks must
    not break the production loop: the watermark rides the delete
    snapshot's inherited summary, the next tick's equality precondition
    still holds, the masked url stays gone, and — because the minhash
    signatures live IN the masked rows — a recrawl of the removed content
    under a new url is RE-ADMITTED (the takedown removed the rows, so the
    retained-corpus signature join no longer suppresses the content)."""
    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    docs = generate_corpus_df(spark, 5).localCheckpoint(eager=True)
    first = docs.limit(3).localCheckpoint(eager=True)
    it.append(first, pages)
    r1 = corpus_tick(spark, pages, kept, run_id="t1", num_partitions=2,
                     require_quality=False)
    assert r1["kept_new"] == 3
    victim = it.read(spark, kept).select("url").limit(1).collect()[0].url

    # O(metadata) takedown of one kept url
    s = it.delete_keys(spark, kept, [victim], key="url")
    assert s is not None
    assert it.read(spark, kept).where(f"url = '{victim}'").count() == 0
    # the watermark survives the delete snapshot (inherited summary)
    assert s["source_snapshot_id"] == r1["source_snapshot_id"]

    # next tick: remaining fresh pages + a recrawl of the victim's CONTENT
    # under a new url — re-admitted, not near-dup-suppressed
    import pyspark.sql.functions as F

    rest = docs.join(first.select("url"), "url", "left_anti")
    readd = first.where(F.col("url") == victim).withColumn(
        "url", F.concat(F.col("url"), F.lit("?readd=1"))
    )
    it.append(rest.union(readd), pages)
    r2 = corpus_tick(spark, pages, kept, run_id="t2", num_partitions=2,
                     require_quality=False)
    assert not r2["lost_race"]
    assert r2["kept_new"] == 3 and r2["dropped_dup"] == 0
    final = {r.url for r in it.read(spark, kept).collect()}
    assert victim not in final and f"{victim}?readd=1" in final
    assert len(final) == 5  # 3 - 1 takedown + 2 rest + 1 re-add


def test_job_cli_corpus_tick_mode(spark, tmp_path, capsys):
    """job.main --corpus-tick: the production loop runs from the
    spark-submit entry; --no-quality-gate keeps the glyph-soup corpus."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main

    tmp = str(tmp_path)
    it.append(generate_corpus_df(spark, 3), f"{tmp}/pages")
    rc = main(["--input", f"{tmp}/pages", "--output", f"{tmp}/kept",
               "--corpus-tick", "--no-quality-gate", "--run-id", "c1",
               "--partitions", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "corpus tick: 3 extracted" in out and "3 kept" in out
    assert len(it.read(spark, f"{tmp}/kept").collect()) == 3


def test_quality_gate_drops_junk(spark, tmp_path):
    """With require_quality=True the Gopher + classifier gate rejects the
    glyph-soup extraction text (no stop words, low alpha fraction), so a
    tick keeps nothing — the gate is live in the loop."""
    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    it.append(generate_corpus_df(spark, 2), pages)
    r = corpus_tick(spark, pages, kept, run_id="q1", num_partitions=2)
    assert r["extracted"] == 2 and r["quality_pass"] == 0 and r["kept_new"] == 0


def test_wap_staged_tick_audit_then_publish(spark, tmp_path):
    """Write-audit-publish: a staged tick is invisible to consumers and
    does not advance the watermark; publish fast-forwards main atomically;
    a rival covering the same window makes the publish lose the race."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.corpus_pipeline import publish_tick

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    it.append(docs.limit(2), pages)

    r = corpus_tick(spark, pages, kept, run_id="staged", num_partitions=2,
                    require_quality=False, stage_branch="audit-1")
    assert r["staged_branch"] == "audit-1" and r["kept_new"] == 2
    assert r["out_snapshot_id"] is None
    # invisible to main: no snapshot, watermark unmoved -> a direct tick
    # would still see the whole delta
    assert it.current_snapshot_id(kept) == 0
    staged = it.read_branch(spark, kept, "audit-1").collect()
    assert len(staged) == 2
    assert all(len(row.sig) == 16 and len(row.band_keys) == 4 for row in staged)

    # audit passes -> publish advances main + watermark in one commit
    p = publish_tick(kept, "audit-1")
    assert not p["lost_race"] and p["kept_new"] == 2
    assert it.snapshot(kept)["summary"]["source_snapshot_id"] == 1
    assert len(it.read(spark, kept).collect()) == 2
    assert it.list_branches(kept) == []  # published branch is dropped
    # the next direct tick sees an up-to-date watermark: clean no-op
    r2 = corpus_tick(spark, pages, kept, run_id="after", num_partitions=2,
                     require_quality=False)
    assert r2["out_snapshot_id"] is None and not r2["lost_race"]

    # stage a second tick over new pages, then let a RIVAL direct tick
    # cover the same window first: the publish must lose the race
    it.append(docs.join(docs.limit(2), "url", "left_anti"), pages)
    r3 = corpus_tick(spark, pages, kept, run_id="staged2", num_partitions=2,
                     require_quality=False, stage_branch="audit-2")
    assert r3["staged_branch"] == "audit-2" and r3["kept_new"] == 2
    rival = corpus_tick(spark, pages, kept, run_id="rival", num_partitions=2,
                        require_quality=False)
    assert rival["kept_new"] == 2 and not rival["lost_race"]
    p2 = publish_tick(kept, "audit-2")
    assert p2["lost_race"] and p2["out_snapshot_id"] is None
    # the losing branch is auditable garbage; dropping it leaves no trace
    it.drop_branch(kept, "audit-2")
    assert len(it.read(spark, kept).collect()) == 4


def test_wap_failed_audit_drops_staged_tick(spark, tmp_path):
    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    it.append(generate_corpus_df(spark, 2).localCheckpoint(eager=True), pages)
    r = corpus_tick(spark, pages, kept, run_id="bad", num_partitions=2,
                    require_quality=False, stage_branch="audit-bad")
    assert r["kept_new"] == 2
    it.drop_branch(kept, "audit-bad")
    # nothing ever reached main; the same delta is fully reprocessable
    assert it.current_snapshot_id(kept) == 0
    r2 = corpus_tick(spark, pages, kept, run_id="retry", num_partitions=2,
                     require_quality=False)
    assert r2["kept_new"] == 2 and it.current_snapshot_id(kept) == 1
