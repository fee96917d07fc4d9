"""The complete ketos workflow, composed end-to-end through the job CLI:
compile -> pretrain -> train (augment + normalization, warm-started from
the pretrain checkpoint) -> test, segtrain -> segtest, rotrain -> roadd,
convert -> metadata surgery — every ketos command analog chained on one
corpus, each leg consuming the previous leg's artifact."""

from __future__ import annotations

import json

import numpy as np
import pytest


def _last_json(capsys) -> dict:
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_full_ketos_workflow(tmp_path, capsys):
    import pyspark.sql.functions as F

    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main
    from kraken_spark.kernels.modelio import load_kraken_model
    from kraken_spark.kernels.ro_train import load_mlp
    from kraken_spark.kernels.seg_train import load_weights
    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-ketos-flow", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2, segmenter="blla")
    alto = serialize_extractions(ext, "alto").select("url", "document")
    pairs = str(tmp_path / "pairs.parquet")
    (alto.join(docs.select("url", "html"), "url")
     .select("url", F.encode("document", "UTF-8").alias("xml"),
             F.col("html").alias("image"))
     .write.parquet(pairs))

    # 1. ketos compile: transcribed markup -> line dataset
    ds = str(tmp_path / "lines.arrow")
    assert main(["--input", pairs, "--output", ds,
                 "--compile-dataset"]) == 0
    rep = _last_json(capsys)
    assert rep["train"] > 0

    # 2. ketos pretrain: self-supervised checkpoint on the same lines
    pre = str(tmp_path / "pretrained.safetensors")
    assert main(["--input", ds, "--output", pre, "--pretrain-recognizer",
                 "--train-steps", "2", "--train-batch", "8"]) == 0
    assert _last_json(capsys)["n_masked_frames"] > 0

    # 3. ketos train: warm-start from the pretrain checkpoint, with
    #    augmentation and GT normalization
    rec = str(tmp_path / "rec.safetensors")
    assert main(["--input", ds, "--output", rec, "--train-recognizer",
                 "--model", pre, "--train-steps", "2", "--train-batch", "8",
                 "--augment", "--normalization", "NFC"]) == 0
    t = _last_json(capsys)
    assert t["n_lines"] > 0
    rec_bundle = load_kraken_model(rec)[0]

    # 4. ketos test: evaluate the trained model on the train split
    assert main(["--input", ds, "--output", str(tmp_path / "na"),
                 "--model", rec, "--test-recognizer",
                 "--test-split", "train"]) == 0
    tr = _last_json(capsys)
    assert tr["n_lines"] == t["n_lines"] and 0.0 <= tr["accuracy"] <= 1.0

    # 5. ketos segtrain (with augmentation) -> segtest
    seg = str(tmp_path / "seg.safetensors")
    assert main(["--input", pairs, "--output", seg, "--train-segmenter",
                 "--train-steps", "3", "--augment"]) == 0
    sg = _last_json(capsys)
    assert sg["n_pages"] == 4 and load_weights(seg) is not None
    assert main(["--input", pairs, "--output", str(tmp_path / "na2"),
                 "--test-segmenter"]) == 0
    st = _last_json(capsys)
    assert st["f1"] == 1.0 and "detection" in st

    # 6. ketos rotrain -> roadd (RO net nested into the seg container)
    ro = str(tmp_path / "ro.safetensors")
    assert main(["--input", pairs, "--output", ro, "--train-ro",
                 "--train-steps", "40"]) == 0
    rr = _last_json(capsys)
    assert rr["loss_after"] < rr["loss_before"] and rr["level"] == "baselines"
    combined = str(tmp_path / "seg_with_ro.safetensors")
    assert main(["--input", f"{seg},{ro}", "--output", combined,
                 "--roadd"]) == 0
    assert load_mlp(combined) is not None
    assert load_weights(combined) is not None

    # 7. ketos convert: trained recognizer -> CoreML and back. CoreML
    #    LSTMs carry ONE bias vector per direction, so ih+hh biases merge
    #    on write and read back as bias_hh with bias_ih zeroed
    #    (modelio.py save/load contract — functionally identical);
    #    everything else must be byte-identical
    ml = str(tmp_path / "rec.weights")
    assert main(["--input", rec, "--output", ml, "--convert-model",
                 "--weights-format", "coreml"]) == 0
    ml_out = _last_json(capsys)["output"]
    assert ml_out.endswith(".mlmodel")
    back = load_kraken_model(ml_out)[0]
    for k, w in rec_bundle.weights.items():
        w32 = np.asarray(w, np.float32)
        if ".bias_ih_" in k:
            assert (back.weights[k] == 0).all(), k
        elif ".bias_hh_" in k:
            merged = w32 + np.asarray(
                rec_bundle.weights[k.replace(".bias_hh_", ".bias_ih_")],
                np.float32)
            assert np.allclose(back.weights[k], merged, atol=1e-6), k
        else:
            assert back.weights[k].tobytes() == w32.tobytes(), k

    # 8. metadata surgery on the converted model
    noted = str(tmp_path / "rec_noted.safetensors")
    assert main(["--input", ml_out, "--output", noted,
                 "--set-model-metadata",
                 json.dumps({"note": "workflow-e2e"})]) == 0
    assert load_kraken_model(noted)[0].metadata["note"] == "workflow-e2e"
