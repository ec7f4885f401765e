"""Persistent IVFADC index (operators/ann_index.py): build/save/load
round-trip fidelity, partition-pruned serving, and recall vs the exact
brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from collective_als_spark.operators.ann_index import IvfPqIndex
from collective_als_spark.operators.similarity import brute_force_topk
from collective_als_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


@pytest.fixture(scope="module")
def saved_index(spark, emb, tmp_path_factory):
    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path_factory.mktemp("ann") / "ivfpq")
    idx.save(path)
    return idx, path


def _result_set(df):
    return {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rk"]) for r in df.collect()
    }


def test_loaded_search_equals_inmemory(spark, emb, saved_index):
    """Nothing is refit on load: the saved quantizers + codes must
    reproduce the in-memory index's answers exactly."""
    idx, path = saved_index
    loaded = IvfPqIndex.load(spark, path)
    queries = emb.orderBy("vec_id").limit(20)
    # rerank_depth >= corpus size: the per-partition local top-depth
    # otherwise admits different margin candidates for the differently
    # partitioned in-memory vs parquet-read code frames
    a = _result_set(idx.search(queries, emb, k=5, n_probe=4, rerank_depth=1000))
    b = _result_set(loaded.search(queries, emb, k=5, n_probe=4, rerank_depth=1000))
    assert a == b and len(a) > 0


def test_search_prunes_cell_partitions(spark, emb, saved_index):
    """The probed-cell filter must reach the parquet source as
    directory-level partition pruning on a saved index."""
    idx, path = saved_index
    loaded = IvfPqIndex.load(spark, path)
    one_query = emb.orderBy("vec_id").limit(1)
    # the serve-path probed-cell filter must appear as a PARTITION
    # filter on the parquet source (directory pruning), not a data
    # filter (inputFiles() reports pre-pruning, so inspect the plan)
    pruned = loaded.encoded.filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    out = loaded.search(one_query, emb, k=3, n_probe=2)
    assert out.count() == 3


def test_recall_vs_brute_force(spark, emb, saved_index):
    """IVFADC with generous probes recalls most exact neighbors
    (deterministic seeds; same bar as the ivfadc_topk recall test)."""
    idx, _ = saved_index
    queries = emb.orderBy("vec_id").limit(50)
    approx = idx.search(queries, emb, k=5, n_probe=6, rerank_depth=60)
    exact = brute_force_topk(emb, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_query_batch_cap(spark, emb, saved_index):
    idx, _ = saved_index
    import collective_als_spark.operators.ann_index as A

    orig = A._MAX_QUERY_BATCH
    A._MAX_QUERY_BATCH = 10
    try:
        with pytest.raises(ValueError, match="query batch exceeds"):
            idx.search(emb.limit(11), emb, k=3)
    finally:
        A._MAX_QUERY_BATCH = orig


def test_load_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        IvfPqIndex.load(spark, str(tmp_path / "nope"))


def test_search_out_of_corpus_queries(spark, emb, saved_index):
    """Serve-many: query ids absent from the corpus must still get
    reranked answers (query vectors come from the batch itself)."""
    idx, _ = saved_index
    fresh = emb.orderBy("vec_id").limit(5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    out = idx.search(fresh, emb, k=3, n_probe=6)
    rows = out.collect()
    assert len(rows) == 15
    # every answered query is one of the fresh out-of-corpus ids
    assert {r["query_id"] for r in rows} == {
        r["vec_id"] for r in fresh.collect()
    }
    # the nearest corpus neighbor of a shifted copy is its source
    # vector with cos == 1.0
    assert all(r["cos"] <= 1.0 for r in rows)


def test_duplicate_query_ids_answered_once(spark, emb, saved_index):
    """Regression (ADVICE r04): a batch containing the same id twice
    must not fill top-k slots with copies of one neighbor — the batch
    is deduped by id and answered exactly once."""
    idx, _ = saved_index
    one = emb.orderBy("vec_id").limit(3)
    doubled = one.unionAll(one)
    clean = _result_set(idx.search(one, emb, k=5, n_probe=4, rerank_depth=1000))
    duped = _result_set(idx.search(doubled, emb, k=5, n_probe=4, rerank_depth=1000))
    assert duped == clean
    rows = idx.search(doubled, emb, k=5, n_probe=4, rerank_depth=1000).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q, ns in per_q.items():
        assert len(ns) == len(set(ns)), f"duplicate neighbors for {q}"


def test_save_load_on_file_uri(spark, emb, tmp_path):
    """The quantizers.json sidecar rides the same filesystem layer as
    the codes parquet: a `file:`-scheme root round-trips through
    Hadoop IO with identical answers (ADVICE r04)."""
    idx = IvfPqIndex.build(emb.limit(200), n_cells=4, m=8, n_codes=8, seed=7)
    root = "file:" + str(tmp_path / "ivfpq_uri")
    idx.save(root)
    loaded = IvfPqIndex.load(spark, root)
    q = emb.orderBy("vec_id").limit(5)
    a = _result_set(idx.search(q, emb, k=3, n_probe=4, rerank_depth=1000))
    b = _result_set(loaded.search(q, emb, k=3, n_probe=4, rerank_depth=1000))
    assert a == b and len(a) > 0
    with pytest.raises(FileNotFoundError):
        IvfPqIndex.load(spark, "file:" + str(tmp_path / "nope"))


def _recall(approx_df, exact_df):
    a = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact_df.collect()}
    return len(a & e) / len(e)


def test_incremental_add_appends_and_serves(spark, emb, tmp_path):
    """add(): new vectors are assigned to existing cells, encoded with
    existing codebooks, appended INTO the cell-partitioned codes —
    and a fresh load serves the combined corpus identically."""
    base = emb.orderBy("vec_id").limit(400)
    rest = emb.orderBy("vec_id").offset(400)
    n_rest = rest.count()
    assert n_rest > 0
    idx = IvfPqIndex.build(base, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "incr")
    idx.save(path)
    metrics = idx.add(rest)
    assert metrics["added"] == n_rest
    assert idx.encoded.count() == 400 + n_rest
    # a FRESH load sees the appended codes (persisted, not in-memory)
    loaded = IvfPqIndex.load(spark, path)
    assert loaded.encoded.count() == 400 + n_rest
    queries = emb.orderBy("vec_id").limit(10)
    a = _result_set(idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000))
    b = _result_set(loaded.search(queries, emb, k=5, n_probe=8, rerank_depth=1000))
    assert a == b and len(a) > 0
    # added vectors are findable: query FROM the added set
    added_q = rest.limit(3)
    hits = loaded.search(added_q, emb, k=3, n_probe=8, rerank_depth=1000)
    assert hits.count() > 0


def test_incremental_recall_within_tolerance_of_rebuild(spark, emb, tmp_path):
    """Recall on the combined corpus: incremental ingest (frozen
    quantizers) must stay within tolerance of a fresh rebuild."""
    base = emb.orderBy("vec_id").limit(400)
    rest = emb.orderBy("vec_id").offset(400)
    idx = IvfPqIndex.build(base, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "incr2")
    idx.save(path)
    idx.add(rest)
    fresh = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    queries = emb.orderBy("vec_id").limit(25)
    exact = brute_force_topk(emb, queries, k=5)
    r_incr = _recall(idx.search(queries, emb, k=5, n_probe=6, rerank_depth=1000), exact)
    r_fresh = _recall(fresh.search(queries, emb, k=5, n_probe=6, rerank_depth=1000), exact)
    assert r_incr >= r_fresh - 0.15, f"incr {r_incr:.2f} vs fresh {r_fresh:.2f}"


def test_add_drift_metric_is_retrain_signal(spark, emb):
    """In-distribution ingest drifts ~1; a shifted batch (vectors the
    codebooks never saw, offset far outside the corpus range) must
    report markedly higher drift — the retrain trigger."""
    base = emb.orderBy("vec_id").limit(400)
    rest = emb.orderBy("vec_id").offset(400)
    idx = IvfPqIndex.build(base, n_cells=8, m=8, n_codes=16, seed=42)
    m1 = idx.add(rest)  # in-memory union path
    assert set(m1) == {"added", "replaced", "batch_residual", "build_residual", "drift"}
    assert 0.8 < m1["drift"] < 1.25, m1
    shifted = emb.limit(50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(-7.0) + F.lit(3.5)).alias(
            "embedding"
        ),
    )
    m2 = idx.add(shifted)
    # the relative-residual metric is bounded near 1 once codebooks
    # stop reconstructing at all, so the signal is an absolute margin
    # over the in-distribution baseline, not a multiplicative blowup
    assert m2["drift"] > m1["drift"] + 0.15, (m1, m2)


def test_publish_load_current_retrain_cycle(spark, emb, tmp_path):
    """Zero-downtime retrain: publish v1, serve it, publish a retrained
    v2 — load_current flips only after the atomic manifest commit, and
    v1 stays loadable for rollback."""
    from collective_als_spark.operators.ann_index import IvfPqIndex as I

    root = str(tmp_path / "serving")
    idx1 = I.build(emb.limit(300), n_cells=4, m=8, n_codes=8, seed=1)
    assert idx1.publish(root) == 1
    cur = I.load_current(spark, root)
    assert cur.encoded.count() == 300
    # retrain on the full corpus, publish as v2
    idx2 = I.build(emb, n_cells=8, m=8, n_codes=16, seed=2)
    assert idx2.publish(root) == 2
    cur2 = I.load_current(spark, root)
    assert cur2.encoded.count() == emb.count()
    # a half-saved version (no manifest) is invisible
    idx1.save(f"{root}/v9")
    assert I.load_current(spark, root).encoded.count() == emb.count()
    # rollback: the old version directory still loads directly
    old = I.load(spark, f"{root}/v1")
    assert old.encoded.count() == 300
    with pytest.raises(FileNotFoundError):
        I.load_current(spark, str(tmp_path / "empty"))


def test_compact_codes_fewer_files_same_results(spark, emb, tmp_path):
    """Repeated add() batches pile small part files into the cell
    dirs; compact_codes folds them to ~one file per cell with
    byte-identical search behavior (r05 verdict #7)."""
    base = emb.orderBy("vec_id").limit(300)
    idx = IvfPqIndex.build(base, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "cc")
    idx.save(path)
    rest = emb.orderBy("vec_id").offset(300)
    for i in range(3):  # three small ingest batches
        idx.add(rest.filter(F.col("vec_id") % 3 == i))
    queries = emb.orderBy("vec_id").limit(10)
    before = _result_set(
        idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    )
    rows_before = idx.encoded.count()
    stats = idx.compact_codes()
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 8  # ~one file per cell
    assert idx.encoded.count() == rows_before
    after = _result_set(
        idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    )
    assert after == before
    # partition pruning still directory-level after the rewrite
    plan = (
        idx.encoded.filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    # unpersisted index refuses (the swap is for owned paths)
    mem = IvfPqIndex.build(base.limit(50), n_cells=2, m=8, n_codes=8, seed=1)
    with pytest.raises(ValueError, match="persisted"):
        mem.compact_codes()


def test_retrain_if_drifted_publishes_new_version(spark, emb, tmp_path):
    """The drift signal now CLOSES the loop: under the threshold no
    work happens; over it a same-shape rebuild is published atomically
    and load_current serves the retrained index."""
    root = str(tmp_path / "serving")
    base = emb.orderBy("vec_id").limit(300)
    idx = IvfPqIndex.build(base, n_cells=4, m=8, n_codes=8, seed=1)
    assert idx.publish(root) == 1
    # in-distribution batch: drift ~1 → no retrain (the add itself
    # appends into the published version's codes — incremental ingest)
    calm = idx.add(emb.orderBy("vec_id").offset(300).limit(100))
    assert idx.retrain_if_drifted(emb, root, calm["drift"]) is None
    assert IvfPqIndex.load_current(spark, root).encoded.count() == 400
    # shifted batch: drift over threshold → retrain from the full
    # current corpus, published as v2
    shifted = emb.limit(60).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(-7.0) + F.lit(3.5)).alias(
            "embedding"
        ),
    )
    m = idx.add(shifted)
    corpus = emb.select("vec_id", "embedding").unionByName(shifted)
    v = idx.retrain_if_drifted(corpus, root, m["drift"], threshold=1.1)
    assert v == 2
    cur = IvfPqIndex.load_current(spark, root)
    assert cur.encoded.count() == corpus.count()
    # the retrained codebooks reconstruct the shifted vectors better
    from collective_als_spark.operators.ann_index import (
        _mean_relative_residual,
    )
    old_res = _mean_relative_residual(shifted, idx.codebooks, "vec_id", "embedding")
    new_res = _mean_relative_residual(shifted, cur.codebooks, "vec_id", "embedding")
    assert new_res < old_res


def test_compact_codes_on_file_uri(spark, emb, tmp_path):
    """compact_codes' stage+swap must work through the Hadoop LogStore
    (URI-scheme paths) — rename() exists on both stores."""
    base = emb.orderBy("vec_id").limit(200)
    idx = IvfPqIndex.build(base, n_cells=4, m=8, n_codes=8, seed=7)
    path = f"file://{tmp_path}/ccuri"
    idx.save(path)
    idx.add(emb.orderBy("vec_id").offset(200).limit(60))
    rows_before = idx.encoded.count()
    stats = idx.compact_codes()
    assert stats["files_after"] <= stats["files_before"]
    assert idx.encoded.count() == rows_before == 260


def test_delete_masks_exclude_from_search(spark, emb, tmp_path):
    """delete(): masked ids vanish from search results without any
    rewrite of codes/ — the masks live as cell-partitioned parquet
    under _deletes/ (the snapshot table's DV pattern), and a fresh
    load honors them too."""
    import os

    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "del")
    idx.save(path)
    queries = emb.orderBy("vec_id").limit(10)
    before = idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    victims = sorted({r["neighbor_id"] for r in before.collect()})[:5]
    stats = idx.delete(
        spark.createDataFrame([(int(v),) for v in victims], "vec_id long")
    )
    assert stats["requested"] == 5 and stats["masked"] == 5
    # the codes were NOT rewritten (logical delete), masks are
    # cell-partitioned like the codes they mask
    assert idx.encoded.count() == emb.count()
    mask_cells = [
        n for n in os.listdir(os.path.join(path, "_deletes"))
        if n.startswith("cell=")
    ]
    assert mask_cells
    after = idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    served = {r["neighbor_id"] for r in after.collect()}
    assert served.isdisjoint(victims) and len(served) > 0
    # equivalence oracle: an in-memory index with the SAME quantizers
    # and the rows dropped eagerly answers identically
    eager = IvfPqIndex(
        spark, idx.centroids, idx.codebooks,
        spark.read.parquet(f"{path}/codes"), idx.id_col, idx.vec_col,
    )
    eager.delete(spark.createDataFrame([(int(v),) for v in victims], "vec_id long"))
    assert _result_set(after) == _result_set(
        eager.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    )
    # a fresh load sees the masks (persisted state, not session state)
    loaded = IvfPqIndex.load(spark, path)
    assert _result_set(
        loaded.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    ) == _result_set(after)


def test_compact_codes_materializes_delete_masks(spark, emb, tmp_path):
    """compact_codes() folds the masks away physically: masked rows
    are gone from codes/, _deletes/ is removed, and answers are
    unchanged — post-compaction serving needs no anti-join."""
    import os

    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "delc")
    idx.save(path)
    n_total = emb.count()
    victims = [int(r["vec_id"]) for r in emb.orderBy("vec_id").limit(7).collect()]
    idx.delete(spark.createDataFrame([(v,) for v in victims], "vec_id long"))
    queries = emb.orderBy("vec_id").offset(50).limit(10)
    before = _result_set(idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000))
    out = idx.compact_codes()
    assert out["masks_folded"] is True
    assert not os.path.exists(os.path.join(path, "_deletes"))
    assert idx.encoded.count() == n_total - 7
    assert idx._delete_masks() is None
    after = _result_set(idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000))
    assert after == before and len(after) > 0


def test_delete_absent_ids_is_noop(spark, emb, tmp_path):
    """Deleting ids not in the index writes no masks and changes no
    answers; re-running compact stays clean."""
    import os

    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "deln")
    idx.save(path)
    queries = emb.orderBy("vec_id").limit(5)
    before = _result_set(idx.search(queries, emb, k=3, n_probe=8, rerank_depth=1000))
    stats = idx.delete(
        spark.createDataFrame([(10_000_000,), (10_000_001,)], "vec_id long")
    )
    assert stats["requested"] == 2 and stats["masked"] == 0
    assert not os.path.exists(os.path.join(path, "_deletes"))
    out = idx.compact_codes()
    assert out["masks_folded"] is False
    assert _result_set(
        idx.search(queries, emb, k=3, n_probe=8, rerank_depth=1000)
    ) == before


def test_publish_after_delete_does_not_resurrect(spark, emb, tmp_path):
    """Pending delete masks travel with save()/publish(): the new
    version's codes are the MASKED view, so load_current() can never
    serve ids the old version already deleted."""
    import os

    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    root = str(tmp_path / "pubdel")
    v1 = idx.publish(root)
    served = IvfPqIndex.load_current(spark, root)
    victims = [int(r["vec_id"]) for r in emb.orderBy("vec_id").limit(6).collect()]
    served.delete(spark.createDataFrame([(v,) for v in victims], "vec_id long"))
    v2 = served.publish(root)
    assert v2 == v1 + 1
    fresh = IvfPqIndex.load_current(spark, root)
    assert fresh.encoded.count() == emb.count() - 6
    assert not os.path.exists(os.path.join(root, f"v{v2}", "_deletes"))
    queries = emb.orderBy("vec_id").offset(100).limit(8)
    out = fresh.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    assert {r["neighbor_id"] for r in out.collect()}.isdisjoint(victims)


def test_search_distributed_matches_driver_search(spark, emb, saved_index):
    """The cogroup-by-cell scan (no driver LUTs, unbounded batches)
    must reproduce search()'s answers exactly for the same
    parameters — same probes, same ADC math, same rerank."""
    idx, path = saved_index
    loaded = IvfPqIndex.load(spark, path)
    queries = emb.orderBy("vec_id").limit(40)
    a = _result_set(
        loaded.search(queries, emb, k=5, n_probe=4, rerank_depth=1000)
    )
    b = _result_set(
        loaded.search_distributed(
            queries, emb, k=5, n_probe=4, rerank_depth=1000
        )
    )
    assert a == b and len(a) > 0
    # tiny query chunks exercise the intra-task chunking identically
    c = _result_set(
        loaded.search_distributed(
            queries, emb, k=5, n_probe=4, rerank_depth=1000, query_chunk=7
        )
    )
    assert c == a


def test_search_distributed_honors_delete_masks(spark, emb, tmp_path):
    """Logical deletes apply to the distributed path exactly as to
    search(): masked ids never appear, answers match."""
    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "sd")
    idx.save(path)
    queries = emb.orderBy("vec_id").limit(10)
    before = idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    victims = sorted({r["neighbor_id"] for r in before.collect()})[:4]
    idx.delete(spark.createDataFrame([(int(v),) for v in victims], "vec_id long"))
    a = _result_set(idx.search(queries, emb, k=5, n_probe=8, rerank_depth=1000))
    b = _result_set(
        idx.search_distributed(queries, emb, k=5, n_probe=8, rerank_depth=1000)
    )
    assert a == b and len(a) > 0
    assert {n for (_q, n, _c, _r) in b}.isdisjoint(victims)


def test_filtered_search_is_single_stage(spark, emb, saved_index):
    """Attribute-filtered search returns a FULL top-k among the rows
    passing the predicate (single-stage filtering) — equal to the
    exact brute-force top-k over the filtered corpus, and disjoint
    from excluded ids even where an unfiltered search would have
    returned them. Both serve paths agree."""
    idx, _path = saved_index
    queries = emb.orderBy("vec_id").limit(10)
    where = "vec_id % 3 = 0"
    got = idx.search(
        queries, emb, k=5, n_probe=8, rerank_depth=100000, where=where
    )
    rows = got.collect()
    assert rows and all(r["neighbor_id"] % 3 == 0 for r in rows)
    # every query still gets a FULL k (the filtered corpus is plenty)
    per_q = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert set(per_q.values()) == {5}
    # exhaustive probing + full rerank depth == exact filtered top-k
    want = _result_set(
        brute_force_topk(
            emb.filter(F.expr(where)), queries, k=5
        )
    )
    assert _result_set(got) == want
    # the distributed path answers identically
    dist = idx.search_distributed(
        queries, emb, k=5, n_probe=8, rerank_depth=100000, where=where
    )
    assert _result_set(dist) == want


def test_filtered_search_composes_with_deletes(spark, emb):
    """where + delete masks compose: a deleted id never returns even
    when it passes the attribute filter."""
    base = emb.limit(200)
    idx = IvfPqIndex.build(base, n_cells=4, m=8, n_codes=8, seed=7)
    queries = base.orderBy("vec_id").limit(5)
    unfiltered = idx.search(
        queries, base, k=5, n_probe=4, rerank_depth=100000,
        where="vec_id % 2 = 0",
    )
    victim = int(unfiltered.first()["neighbor_id"])
    idx.delete(spark.createDataFrame([(victim,)], "vec_id long"))
    after = idx.search(
        queries, base, k=5, n_probe=4, rerank_depth=100000,
        where="vec_id % 2 = 0",
    )
    ids = {r["neighbor_id"] for r in after.collect()}
    assert victim not in ids
    assert all(i % 2 == 0 for i in ids)


def test_add_replace_upserts_id(spark, emb, tmp_path):
    """add(replace=True) — the id-UPSERT (r09 verdict #6): the old
    rows of re-added ids are masked at their generation and the fresh
    rows serve; no duplicate candidates, compact folds the superseded
    rows physically, publish carries the masked view."""
    import os

    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    path = str(tmp_path / "ups")
    idx.save(path)
    n_total = emb.count()
    rows = emb.orderBy("vec_id").limit(2).collect()
    victim = int(rows[0]["vec_id"])
    donor_vec = list(rows[1]["embedding"])
    # re-add the victim id with the DONOR's vector
    repl = spark.createDataFrame(
        [(victim, donor_vec)], "vec_id long, embedding array<float>"
    )
    stats = idx.add(repl, replace=True)
    assert stats["added"] == 1 and stats["replaced"] == 1
    # physical: old row still on disk (masked), new row appended
    assert idx.encoded.count() == n_total + 1
    # the corpus table a caller would serve against carries the new
    # vector for the replaced id
    vectors = (
        emb.filter(F.col("vec_id") != victim)
        .select("vec_id", "embedding")
        .unionByName(repl)
    )
    probe = spark.createDataFrame(
        [(999_999, donor_vec)], "vec_id long, embedding array<float>"
    )
    got = idx.search(probe, vectors, k=4, n_probe=8, rerank_depth=1000)
    res = got.collect()
    served = [r for r in res if r["neighbor_id"] == victim]
    # exactly ONE candidate row for the replaced id, scoring ~1 against
    # its NEW vector (the old row would have scored its old embedding)
    assert len(served) == 1 and served[0]["cos"] > 0.999
    # a fresh load honors the upsert (persisted masks, not session state)
    loaded = IvfPqIndex.load(spark, path)
    assert _result_set(
        loaded.search(probe, vectors, k=4, n_probe=8, rerank_depth=1000)
    ) == _result_set(got)
    # search_distributed agrees
    assert _result_set(
        idx.search_distributed(probe, vectors, k=4, n_probe=8, rerank_depth=1000)
    ) == _result_set(got)
    # compaction folds the superseded row away and answers stay put
    before = _result_set(got)
    idx.compact_codes()
    assert idx.encoded.count() == n_total
    assert not os.path.exists(os.path.join(path, "_deletes"))
    assert _result_set(
        idx.search(probe, vectors, k=4, n_probe=8, rerank_depth=1000)
    ) == before
    # deleting the replaced id removes its FRESH row too
    idx.delete(spark.createDataFrame([(victim,)], "vec_id long"))
    assert not [
        r
        for r in idx.search(
            probe, vectors, k=4, n_probe=8, rerank_depth=1000
        ).collect()
        if r["neighbor_id"] == victim
    ]


def test_add_replace_in_memory_index(spark, emb):
    """In-memory indexes apply the upsert eagerly (anti-join + union):
    same served answers, no mask files involved."""
    idx = IvfPqIndex.build(emb, n_cells=8, m=8, n_codes=16, seed=42)
    rows = emb.orderBy("vec_id").limit(2).collect()
    victim = int(rows[0]["vec_id"])
    donor_vec = list(rows[1]["embedding"])
    repl = spark.createDataFrame(
        [(victim, donor_vec)], "vec_id long, embedding array<float>"
    )
    stats = idx.add(repl, replace=True)
    assert stats["replaced"] == 1
    assert idx.encoded.filter(F.col("nid") == victim).count() == 1
    vectors = (
        emb.filter(F.col("vec_id") != victim)
        .select("vec_id", "embedding")
        .unionByName(repl)
    )
    probe = spark.createDataFrame(
        [(999_999, donor_vec)], "vec_id long, embedding array<float>"
    )
    served = [
        r
        for r in idx.search(
            probe, vectors, k=4, n_probe=8, rerank_depth=1000
        ).collect()
        if r["neighbor_id"] == victim
    ]
    assert len(served) == 1 and served[0]["cos"] > 0.999


def test_add_replace_pre_generation_index_migrates(spark, emb, tmp_path):
    """A saved index predating the generation column refuses
    replace=True with migration guidance; one compact_codes() stamps
    gen=0 and replace works afterwards."""
    import pytest as _pytest

    idx = IvfPqIndex.build(emb.limit(100), n_cells=4, m=8, n_codes=8, seed=7)
    path = str(tmp_path / "legacy")
    idx.save(path)
    # simulate the pre-gen layout: rewrite codes/ without the column
    legacy = spark.read.parquet(f"{path}/codes").drop("gen")
    staged = str(tmp_path / "staged")
    legacy.write.partitionBy("cell").parquet(staged)
    import shutil

    shutil.rmtree(f"{path}/codes")
    shutil.move(staged, f"{path}/codes")
    old = IvfPqIndex.load(spark, path)
    assert "gen" not in old.encoded.columns
    repl = spark.createDataFrame(
        [(0, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="compact_codes"):
        old.add(repl, replace=True)
    # plain append still works at the legacy shape (no mixed schema)
    first = emb.orderBy(F.col("vec_id").desc()).limit(1)
    old.add(first.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"))
    assert "gen" not in old.encoded.columns
    old.compact_codes()  # migration: stamps gen=0
    assert "gen" in old.encoded.columns
    rows = emb.orderBy("vec_id").limit(2).collect()
    repl2 = spark.createDataFrame(
        [(int(rows[0]["vec_id"]), list(rows[1]["embedding"]))],
        "vec_id long, embedding array<float>",
    )
    assert old.add(repl2, replace=True)["replaced"] == 1
