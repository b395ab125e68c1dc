"""Classification job lifecycle (usecases/classification/classifier.go
Schedule/Get, classifier_run.go, validation.go error texts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weaviate_spark.operators import classification_job as C
from weaviate_spark.schema import Collection, Property


@pytest.fixture(autouse=True)
def _clean():
    yield
    C.clear_jobs()


def _coll():
    return Collection(name="Article", properties=[
        Property("body", "text"),
        Property("wordCount", "int"),
        Property("ofCategory", "Category"),
    ])


def _beacon(cat: str):
    return [(f"weaviate://localhost/Category/{cat}", "Category", cat)]


REF_T = ("array<struct<beacon:string,className:string,id:string>>")


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, f"_id string, _vector array<float>, body string, "
              f"group string, ofCategory {REF_T}")


def _base(spark):
    # two tight clusters; ids 'u*' unclassified
    return _frame(spark, [
        ("a1", [1.0, 0.0], "", "g1", _beacon("cat-a")),
        ("a2", [0.9, 0.1], "", "g1", _beacon("cat-a")),
        ("b1", [0.0, 1.0], "", "g1", _beacon("cat-b")),
        ("b2", [0.1, 0.9], "", "g2", _beacon("cat-b")),
        ("u1", [1.0, 0.1], "", "g1", None),
        ("u2", [0.1, 1.0], "", "g1", None),
    ])


def _schedule(spark, df=None, **kw):
    args = dict(class_name="Article", classify_property="ofCategory",
                based_on_property="body", k=3, now_unix=42,
                job_id="job-1")
    args.update(kw)
    return C.schedule_classification(
        df if df is not None else _base(spark), _coll(), **args)


def test_happy_path_classifies_and_writes_meta(spark):
    job, updated = _schedule(spark)
    assert job.status == "completed"
    assert job.meta == {"started": 42, "completed": 42, "count": 2,
                        "countSucceeded": 2, "countFailed": 0}
    rows = {r["_id"]: r for r in updated.collect()}
    assert rows["u1"]["ofCategory"][0]["id"] == "cat-a"
    assert rows["u2"]["ofCategory"][0]["id"] == "cat-b"
    assert rows["u1"]["ofCategory"][0]["beacon"] == \
        "weaviate://localhost/Category/cat-a"
    m = rows["u1"]["_classification"]
    assert m["scope"] == ["ofCategory"] and \
        m["classifiedFields"] == ["ofCategory"] and m["completed"] == 42
    # already-classified rows untouched, no meta
    assert rows["a1"]["ofCategory"][0]["id"] == "cat-a"
    assert rows["a1"]["_classification"] is None
    # Get returns the stored record (classifier.go:278)
    assert C.get_classification("job-1") is job
    assert C.get_classification("nope") is None


def test_no_unclassified_fails_with_reference_text(spark):
    df = _base(spark).where(F.col("ofCategory").isNotNull())
    job, out = _schedule(spark, df=df)
    assert job.status == "failed"
    assert job.error == ("classification failed: no classes to be "
                         "classified - did you run a previous "
                         "classification already?")
    # the frame is returned unmodified on failure
    assert out is df


def test_source_where_limits_sources(spark):
    df = _base(spark).unionByName(
        _frame(spark, [("u3", [0.5, 0.5], "", "g2", None)]))
    job, updated = _schedule(
        spark, df=df, filters=C.ClassificationFilters(
            source_where=F.col("group") == "g1"))
    rows = {r["_id"]: r for r in updated.collect()}
    assert job.meta["count"] == 2            # u3 (g2) excluded
    assert rows["u3"]["ofCategory"] is None
    assert rows["u1"]["ofCategory"][0]["id"] == "cat-a"


def test_training_set_where_limits_training(spark):
    # only g2 training rows -> only cat-b can win
    job, updated = _schedule(
        spark, filters=C.ClassificationFilters(
            training_set_where=F.col("group") == "g2"))
    rows = {r["_id"]: r for r in updated.collect()}
    assert rows["u1"]["ofCategory"][0]["id"] == "cat-b"
    assert rows["u2"]["ofCategory"][0]["id"] == "cat-b"


@pytest.mark.parametrize("kw,msg", [
    (dict(class_name=""), "invalid classification: class must be set"),
    (dict(class_name="Nope"),
     "invalid classification: class 'Nope' not found in schema"),
    (dict(based_on_property="nope"),
     "invalid classification: basedOnProperties: property 'nope' "
     "does not exist"),
    (dict(based_on_property="wordCount"),
     "invalid classification: basedOnProperties: property 'wordCount' "
     "must be of type 'text'"),
    (dict(classify_property="nope"),
     "invalid classification: classifyProperties: property 'nope' "
     "does not exist"),
    (dict(classify_property="body"),
     "invalid classification: classifyProperties: property 'body' "
     "must be of reference type (cref)"),
])
def test_validator_error_texts(spark, kw, msg):
    with pytest.raises(C.InvalidClassificationError) as ei:
        _schedule(spark, **kw)
    assert str(ei.value) == msg


def test_knn_rejects_target_where(spark):
    with pytest.raises(C.InvalidClassificationError) as ei:
        _schedule(spark, filters=C.ClassificationFilters(
            target_where=F.lit(True)))
    assert "for 'knn' you cannot limit target data directly" \
        in str(ei.value)


def test_contextual_rejects_training_set_where(spark):
    with pytest.raises(C.InvalidClassificationError) as ei:
        _schedule(spark, type=C.TYPE_CONTEXTUAL,
                  filters=C.ClassificationFilters(
                      training_set_where=F.lit(True)))
    assert "there is no training data" in str(ei.value)


def test_classify_fn_hook(spark):
    # the modulesProvider analogue: a custom classifier core
    def fn(labeled, queries):
        return queries.select(
            F.col("_kid"),
            F.lit("weaviate://localhost/Category/cat-x")
            .alias("predicted_label"))

    job, updated = _schedule(spark, classify_fn=fn)
    rows = {r["_id"]: r for r in updated.collect()}
    assert rows["u1"]["ofCategory"][0]["id"] == "cat-x"
    assert rows["u1"]["ofCategory"][0]["className"] == "Category"
    assert job.meta["countSucceeded"] == 2


def test_ref_meta_distances(spark):
    # hand-checkable geometry: q=(1,0); winners cat-a at 0° and 26.57°,
    # loser cat-b at 90°
    lab = spark.createDataFrame([
        ("t1", [1.0, 0.0], "weaviate://localhost/Category/cat-a"),
        ("t2", [2.0, 1.0], "weaviate://localhost/Category/cat-a"),
        ("t3", [0.0, 1.0], "weaviate://localhost/Category/cat-b"),
    ], "_kid string, _kvec array<float>, _klabel string")
    q = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "_kid string, _kvec array<float>")
    r = C.knn_classify_with_meta(lab, q, k=3).collect()[0]
    assert r["predicted_label"].endswith("cat-a")
    assert r["overall_count"] == 3 and r["winning_count"] == 2 \
        and r["losing_count"] == 1 and r["votes"] == 2
    # normalized distances (1-cos)/2: t1=0, t2=(1-2/sqrt5)/2, t3=0.5
    import math
    t2 = round((1 - 2 / math.sqrt(5)) / 2, 6)
    assert r["closest_overall_distance"] == 0.0
    assert r["closest_winning_distance"] == 0.0
    assert r["mean_winning_distance"] == round(t2 / 2, 6)
    assert r["mean_losing_distance"] == 0.5
    assert r["closest_losing_distance"] == 0.5


def test_ref_meta_unanimous_vote_null_losing(spark):
    lab = spark.createDataFrame([
        ("t1", [1.0, 0.0], "weaviate://localhost/Category/cat-a"),
        ("t2", [0.9, 0.1], "weaviate://localhost/Category/cat-a"),
    ], "_kid string, _kvec array<float>, _klabel string")
    q = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "_kid string, _kvec array<float>")
    r = C.knn_classify_with_meta(lab, q, k=2).collect()[0]
    # ref_meta.go: losing pointers stay nil on a unanimous vote
    assert r["losing_count"] == 0
    assert r["mean_losing_distance"] is None
    assert r["closest_losing_distance"] is None


def test_contextual_job_routes_and_writes_back(spark):
    from weaviate_spark.ids import uuid_col
    from weaviate_spark.modules import hash_embed_udf

    df = _frame(spark, [
        ("u1", None, "spark filter join query", "g1", None),
        ("u2", None, "window stream batch", "g1", None),
        ("a1", None, "already classified", "g1", _beacon("cat-a")),
    ])
    # targets vectorized with the same deterministic embedder the
    # classifier uses for corpus words
    embed = hash_embed_udf(16)
    targets = spark.createDataFrame(
        [("spark",), ("stream",)], "name string").withColumn(
        "vector", embed(F.col("name")))
    job, updated = _schedule(
        spark, df=df, type=C.TYPE_CONTEXTUAL, targets=targets)
    assert job.status == "completed", job.error
    assert job.target_classes == ["Category"]
    rows = {r["_id"]: r for r in updated.collect()}
    for u in ("u1", "u2"):
        got = rows[u]["ofCategory"][0]
        assert got["className"] == "Category"
        assert got["beacon"].startswith("weaviate://localhost/Category/")
        assert rows[u]["_classification"]["completed"] == 42
    assert rows["a1"]["ofCategory"][0]["id"] == "cat-a"
    assert job.meta["countSucceeded"] == 2


def test_contextual_rejects_multi_target_class(spark):
    coll = Collection(name="Article", properties=[
        Property("body", "text"),
        Property("ofCategory", "Category,Topic"),
    ])
    with pytest.raises(C.InvalidClassificationError) as ei:
        C.schedule_classification(
            _base(spark), coll, class_name="Article",
            classify_property="ofCategory", based_on_property="body",
            type=C.TYPE_CONTEXTUAL)
    assert "requires exactly one target class" in str(ei.value)


def test_contextual_without_targets_fails(spark):
    job, _ = _schedule(spark, type=C.TYPE_CONTEXTUAL)
    assert job.status == "failed"
    assert "target-class frame" in job.error


def test_client_classifications_namespace(spark, tmp_path):
    from weaviate_spark import auth
    from weaviate_spark.client import connect

    ctrl = auth.RbacController()
    ctrl.upsert_role(auth.Role("classifier", [
        auth.Permission(auth.UPDATE,
                        auth.collections_metadata_path("Article")),
        auth.Permission(auth.READ,
                        auth.collections_metadata_path("Article")),
    ]))
    ctrl.assign("alice", "classifier")
    rbac = auth.RbacAuthorizer(ctrl)
    client = connect(spark, str(tmp_path), authorizer=rbac,
                     principal="alice")
    job, _ = client.classifications.schedule(
        _base(spark), _coll(), class_name="Article",
        classify_property="ofCategory", based_on_property="body",
        k=3, now_unix=1, job_id="cli-job")
    assert job.status == "completed"
    assert client.classifications.get("cli-job") is job
    assert client.classifications.get("missing") is None
    # an unauthorized principal is rejected before scheduling
    mallory = connect(spark, str(tmp_path), authorizer=rbac,
                      principal="mallory")
    with pytest.raises(auth.Forbidden):
        mallory.classifications.schedule(
            _base(spark), _coll(), class_name="Article",
            classify_property="ofCategory", based_on_property="body")
    with pytest.raises(auth.Forbidden):
        mallory.classifications.get("cli-job")
