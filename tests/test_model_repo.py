"""Model-repository verbs (kraken get/list/show + ketos publish analogs,
kraken_spark/repo.py + job.py CLI): publish -> list -> show -> get over a
local repository root, with the reference's filter/grouping semantics
(kraken/repo.py:35-90, kraken/kraken.py:640-815) and sha256-verified
fetches. Network-less by design — the transport seam is _read_bytes."""

from __future__ import annotations

import json
import os

import pytest

from kraken_spark import repo as mrepo
from kraken_spark.job import main
from kraken_spark.kernels.rec_train import ASSET

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSET), reason="trained recognizer asset absent")


@pytest.fixture()
def repo_root(tmp_path):
    return str(tmp_path / "repo")


def _publish(root, **meta):
    md = {"summary": "test recognizer", "script": ["Latn"],
          "language": ["eng"], "keywords": ["print"],
          "metrics": {"cer": 1.2},
          "creators": [{"name": "spark-graft"}]}
    md.update(meta)
    return mrepo.publish_model(root, ASSET, md, today="2026-08-20")


def test_publish_list_show_get_roundtrip(repo_root, tmp_path):
    doi = _publish(repo_root)
    assert doi.startswith("10.5072/ks.")
    # listing groups under the concept id, kraken filter passes
    listing = mrepo.list_models(repo_root)
    assert list(listing) == [doi]
    assert listing[doi][0]["summary"] == "test recognizer"
    # filters: OR within a type, AND across types
    assert mrepo.list_models(repo_root, script=("Latn", "Arab"))
    assert not mrepo.list_models(repo_root, script=("Arab",))
    assert not mrepo.list_models(repo_root, script=("Latn",), keyword=("handwriting",))
    assert mrepo.list_models(repo_root, model_type="recognition")
    assert not mrepo.list_models(repo_root, model_type="segmentation")
    # show: v1 record with graphemes derived from the real codec
    rec = mrepo.get_description(repo_root, doi)
    assert rec["software_name"] == "kraken"
    assert rec["graphemes"] and all(isinstance(g, str) for g in rec["graphemes"])
    text = mrepo.render_description(rec)
    assert "DOI: " + doi in text and "cer: 1.20" in text
    # get: sha256-verified fetch into the cache; candidate listing
    cache = str(tmp_path / "cache")
    mdir = mrepo.get_model(repo_root, doi, cache_dir=cache)
    cand = mrepo.model_candidates(mdir)
    assert cand == [os.path.basename(ASSET)]
    fetched = os.path.join(mdir, cand[0])
    assert open(fetched, "rb").read() == open(ASSET, "rb").read()
    # warm cache is a no-op fetch
    assert mrepo.get_model(repo_root, doi, cache_dir=cache) == mdir


def test_checksum_mismatch_fails_loudly(repo_root, tmp_path):
    doi = _publish(repo_root)
    rec = mrepo.get_description(repo_root, doi)
    payload = os.path.join(repo_root, rec["files"][0]["url"])
    with open(payload, "r+b") as f:
        f.seek(0)
        f.write(b"\x00corrupted")
    with pytest.raises(ValueError, match="checksum mismatch"):
        mrepo.get_model(repo_root, doi, cache_dir=str(tmp_path / "c2"))


def test_non_kraken_record_rejected(repo_root):
    doi = _publish(repo_root)
    # forge a non-kraken record (reference: get_description raises
    # ValueError for present-but-filtered records, kraken/repo.py:48-50)
    idx = json.loads(open(os.path.join(repo_root, "index.json")).read())
    idx["10.5072/other.1"] = dict(idx[doi], doi="10.5072/other.1",
                                  software_name="tesseract", keywords=[])
    json.dump(idx, open(os.path.join(repo_root, "index.json"), "w"))
    with pytest.raises(ValueError, match="not a valid kraken record"):
        mrepo.get_description(repo_root, "10.5072/other.1")
    # and the listing silently filters it (kraken.py:758 filter_fn)
    assert "10.5072/other.1" not in mrepo.list_models(repo_root)
    with pytest.raises(KeyError):
        mrepo.get_description(repo_root, "10.5072/absent")


def test_update_links_concept_and_sorts_newest_first(repo_root, tmp_path):
    doi1 = _publish(repo_root)
    # a new version of the same concept: same payload, new metadata —
    # deposit ids are content+metadata addressed so this mints a new id
    doi2 = mrepo.publish_model(
        repo_root, ASSET,
        {"summary": "v2", "script": ["Latn"]},
        update_of=doi1, today="2026-08-21")
    assert doi1 != doi2
    listing = mrepo.list_models(repo_root)
    assert list(listing) == [doi1]  # one concept
    assert [r["doi"] for r in listing[doi1]] == [doi2, doi1]  # newest first


def test_cli_verbs(repo_root, tmp_path, capsys):
    meta = json.dumps({"summary": "cli model", "script": ["Latn"]})
    rc = main(["--input", ASSET, "--output", "unused",
               "--model-repo", repo_root, "--publish-model", meta])
    assert rc == 0
    doi = capsys.readouterr().out.strip().split()[-1]
    assert doi.startswith("10.5072/ks.")
    assert main(["--input", "unused", "--output", "unused",
                 "--model-repo", repo_root, "--list-models"]) == 0
    out = capsys.readouterr().out
    assert doi in out and "cli model" in out
    assert main(["--input", "unused", "--output", "unused",
                 "--model-repo", repo_root, "--show-model", doi]) == 0
    assert "DOI: " + doi in capsys.readouterr().out
    cache = str(tmp_path / "clicache")
    assert main(["--input", "unused", "--output", "unused",
                 "--model-repo", repo_root, "--get-model", doi,
                 "--model-cache", cache]) == 0
    out = capsys.readouterr().out
    assert "Model dir: " in out and os.path.basename(ASSET) in out
    # unknown id exits 1 with a message, like the reference CLI
    assert main(["--input", "unused", "--output", "unused",
                 "--model-repo", repo_root, "--show-model", "nope"]) == 1


def test_model_repo_resolution_drives_extraction(repo_root, tmp_path):
    """--model repo:<id> resolves through the repository cache and the
    extraction actually runs the fetched trained model (the `kraken get`
    -> `kraken ocr -m` chain as one spark-submit invocation)."""
    import tempfile

    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-repo", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    doi = _publish(repo_root)
    tmp = tempfile.mkdtemp(prefix="ks_repo_e2e_")
    generate_corpus_df(spark, 2).write.mode("overwrite").parquet(f"{tmp}/in")
    rc = main(["--input", f"{tmp}/in", "--output", f"{tmp}/out",
               "--model", f"repo:{doi}", "--model-repo", repo_root,
               "--model-cache", str(tmp_path / "cache")])
    assert rc == 0
    rows = spark.read.parquet(f"{tmp}/out").collect()
    assert len(rows) == 2
    # the trained recognizer produced text through the repo-fetched model
    assert all(r.n_lines > 0 for r in rows)
    assert any(r.text.strip() for r in rows)
