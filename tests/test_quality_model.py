"""Learned quality filter: hashed-BOW logistic regression distillation —
train/score round-trip, separability, and holdout generalization."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from kadiyadb_spark.functions.quality_model import (
    distill_heuristic_gate,
    score_quality,
    train_quality_model,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs to the house "
    "with some friends because it was a fine day for all of them"
).split()


def _docs(spark, n_good=60, n_junk=60):
    rng = random.Random(7)
    rows = []
    for i in range(n_good):
        rows.append(Row(doc_id=i, text=" ".join(rng.choices(GOOD, k=80)), label=1))
    for i in range(n_good, n_good + n_junk):
        junk = " ".join("###@@" + str(rng.randint(0, 9)) for _ in range(30))
        rows.append(Row(doc_id=i, text=junk, label=0))
    return spark.createDataFrame(rows)


def test_train_score_separates_good_from_junk(spark):
    docs = _docs(spark)
    model = train_quality_model(docs, dim=256, max_iter=20)
    assert len(model["weights"]) == 256
    scored = score_quality(docs, model)
    j = scored.join(docs.select("doc_id", "label"), "doc_id")
    acc = j.select(
        F.avg((F.col("quality_pass").cast("int") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc >= 0.95
    lo, hi = scored.select(F.min("quality_score"), F.max("quality_score")).first()
    assert 0.0 <= lo <= hi <= 1.0


def test_distilled_gate_generalizes_to_holdout(spark):
    """The model never sees the md5(id)%5==0 slice; its agreement with the
    heuristic gate there measures generalization, not memorization."""
    from kadiyadb_spark.functions.text import gopher_rules

    docs = _docs(spark)
    model, scored = distill_heuristic_gate(docs, dim=256, holdout_mod=5)
    gate = gopher_rules(docs).select("doc_id", F.col("passes").cast("boolean").alias("_gate"))
    split = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(5),
    )
    holdout = scored.join(gate, "doc_id").filter(split == 0)
    n = holdout.count()
    assert n > 0
    agree = holdout.select(
        F.avg((F.col("quality_pass") == F.col("_gate")).cast("double"))
    ).first()[0]
    assert agree >= 0.8


def test_model_save_load_roundtrip_scores_identically(spark, tmp_path):
    from kadiyadb_spark.functions.quality_model import load_model, save_model

    docs = _docs(spark, 20, 20)
    model = train_quality_model(docs, dim=64, max_iter=10)
    path = f"{tmp_path}/models/quality.json"
    save_model(spark, model, path)
    loaded = load_model(spark, path)
    assert loaded["dim"] == 64 and loaded["bias"] == model["bias"]
    a = {r["doc_id"]: r["quality_score"] for r in score_quality(docs, model).collect()}
    b = {r["doc_id"]: r["quality_score"] for r in score_quality(docs, loaded).collect()}
    assert a == b
    # atomic: double-save refuses rather than clobbering
    import pytest as _pytest

    with _pytest.raises(IOError):
        save_model(spark, model, path)


def test_model_save_bare_filename(spark):
    """A path with no '/' must not mkdir a directory named like the model
    file (rsplit on a bare name returns the whole path). Bare names resolve
    against the JVM working dir, so clean up through the same FS layer."""
    import uuid

    from kadiyadb_spark.fs import HadoopFS
    from kadiyadb_spark.functions.quality_model import load_model, save_model

    name = f"bare_model_{uuid.uuid4().hex[:8]}.json"
    fs = HadoopFS(spark, name)
    try:
        model = {"weights": [0.0] * 4, "bias": 0.5, "dim": 4}
        save_model(spark, model, name)
        assert load_model(spark, name)["dim"] == 4
    finally:
        fs.delete(name)


def test_centroid_model_separates_and_is_deterministic(spark):
    """The closed-form centroid fit (r13, the value-hash-certifiable
    sibling of the LBFGS trainer): separability on the synthetic good/junk
    corpus, and bit-identical scores across two independent fits (no RNG,
    no FP accumulation — exact integer class sums)."""
    from kadiyadb_spark.functions.quality_model import (
        score_quality_centroid,
        train_quality_centroid,
    )

    docs = _docs(spark)
    model = train_quality_centroid(docs, dim=128)
    assert len(model["s1"]) == 128 and len(model["s0"]) == 128
    assert all(isinstance(v, int) for v in model["s1"])
    scored = score_quality_centroid(docs, model)
    j = scored.join(docs.select("doc_id", "label"), "doc_id")
    acc = j.select(
        F.avg((F.col("quality_pass") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc >= 0.95
    # determinism: a second fit + score is value-identical
    model2 = train_quality_centroid(docs, dim=128)
    assert model2 == model
    a = {r["doc_id"]: (r["quality_score"], r["quality_pass"])
         for r in scored.collect()}
    b = {r["doc_id"]: (r["quality_score"], r["quality_pass"])
         for r in score_quality_centroid(docs, model2).collect()}
    assert a == b


def test_centroid_model_zero_token_and_missing_class_guards(spark):
    """Zero-token docs score 0/fail; an absent class contributes a zero
    term rather than a NaN/div-by-zero."""
    from pyspark.sql import Row

    from kadiyadb_spark.functions.quality_model import (
        score_quality_centroid,
        train_quality_centroid,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="all good words here", label=1),
            Row(doc_id=1, text="more fine words too", label=1),
            Row(doc_id=2, text="", label=1),  # zero tokens
        ]
    )
    model = train_quality_centroid(docs, dim=32)  # class 0 absent
    got = {r["doc_id"]: (r["quality_score"], r["quality_pass"])
           for r in score_quality_centroid(docs, model).collect()}
    assert got[2] == (0.0, 0)          # zero-token doc: score 0, fail
    assert got[0][0] > 0 and got[0][1] == 1   # cos to own class-sum > 0
    assert all(v[0] == v[0] for v in got.values())  # no NaN anywhere
