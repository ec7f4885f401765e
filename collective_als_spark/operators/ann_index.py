"""Persistent IVFADC vector index: build once, save, load, serve.

The ANN operators in operators/similarity.py quantize + encode on
every call — right for one-shot analytics, wrong for serving. At
100 TB the quantizers (k-means cells, PQ codebooks) are trained once,
the corpus is encoded once, and millions of queries amortize that
build. This module adds the missing lifecycle around the same
machinery (the centroid/codebook fits, narrow encode pass, ADC scan
and bounded exact rerank are shared with `ivfadc_topk`):

- ``IvfPqIndex.build(...)`` — train quantizers + encode the corpus;
- ``.save(path)`` — encoded codes as parquet **partitioned by cell**,
  quantizers + metadata as JSON sidecars. Cell-partitioning turns the
  serve path's probed-cell filter into genuine directory-level
  partition pruning: a query batch probing 6 of 256 cells opens 6/256
  of the files (asserted via inputFiles in tests/test_ann_index.py —
  the same data-skipping story as sources/layout.py, applied to
  vector search);
- ``IvfPqIndex.load(spark, path)`` — reopen for serving; nothing is
  refit;
- ``.search(queries, vectors, ...)`` — probe → partition-pruned ADC
  scan over byte codes → exact rerank against the original vector
  table. The per-call driver state is bounded: the query batch
  (capped), the tiny quantizers, and per-query LUTs.

Storage layout::

    <root>/codes/cell=<c>/part-*.parquet     (nid, codes)
    <root>/_deletes/cell=<c>/part-*.parquet  (nid) — logical delete
                                             masks, folded away by
                                             compact_codes()
    <root>/quantizers.json                   (centroids, codebooks, meta)
"""

from __future__ import annotations

import json
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from collective_als_spark.functions.vector import cosine_similarity
from collective_als_spark.operators.similarity import (
    _assign_cells,
    _fit_pq_codebooks,
    _pq_encode,
)

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
    ]
)

_MAX_QUERY_BATCH = 10_000  # LUTs are (q, m, n_codes) driver-side; keep bounded

_RES_SCHEMA = T.StructType(
    [
        T.StructField("err_sum", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _encode_with(
    vectors: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str,
    vec_col: str,
    gen: int = 0,
) -> DataFrame:
    """(nid, codes, cell, gen) for a vector frame using FROZEN
    quantizers — the shared encode path of build() and add(): cell
    assignment and PQ codes are both one narrow Arrow pass; nothing is
    refit. ``gen`` is the ingest GENERATION stamp: build writes 0,
    each add() batch the next integer — what lets a delete mask
    suppress exactly the rows that existed when it was written and an
    id-upsert (add(replace=True)) supersede older rows without
    touching them."""
    dvec = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cell_of = _assign_cells(vectors, centroids, id_col, vec_col, 1).select(
        F.col("vid").alias("nid"), "cell"
    )
    return (
        _pq_encode(dvec, codebooks, id_col)
        .join(cell_of, "nid")
        .withColumn("gen", F.lit(int(gen)).cast("long"))
    )


def _mean_relative_residual(
    vectors: DataFrame, codebooks: np.ndarray, id_col: str, vec_col: str
) -> float:
    """Mean ||v - PQ-reconstruction(v)|| / ||v|| over a vector frame:
    the quantization-distortion statistic. Computed distributedly (one
    narrow Arrow pass emitting per-batch partial sums; the driver sees
    one row). Comparing a fresh batch's residual to the build-time
    corpus residual is the standard retrain signal — codebooks fitted
    on yesterday's distribution reconstruct today's drifted vectors
    worse, and recall degrades in proportion."""
    m, _, sub = codebooks.shape

    def res(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].values)
            parts = x.reshape(len(x), m, sub)
            recon = np.empty_like(parts)
            for j in range(m):
                d2 = ((parts[:, j, None, :] - codebooks[j][None, :, :]) ** 2).sum(-1)
                recon[:, j, :] = codebooks[j][d2.argmin(1)]
            err = np.sqrt(((parts - recon) ** 2).sum((1, 2)))
            norm = np.sqrt((x**2).sum(1)) + 1e-12
            yield pd.DataFrame(
                {"err_sum": [float((err / norm).sum())], "n": [len(x)]}
            )

    row = (
        vectors.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(res, _RES_SCHEMA)
        .agg(F.sum("err_sum").alias("e"), F.sum("n").alias("n"))
        .first()
    )
    if not row["n"]:
        raise ValueError("empty vector frame")
    return float(row["e"]) / int(row["n"])


class IvfPqIndex:
    """IVF coarse quantizer + per-subspace PQ codebooks + encoded
    corpus. Construct via :meth:`build` or :meth:`load`."""

    def __init__(
        self,
        spark: SparkSession,
        centroids: np.ndarray,  # (n_cells, dim)
        codebooks: np.ndarray,  # (m, n_codes, dim/m)
        encoded: DataFrame,  # (nid, codes, cell)
        id_col: str,
        vec_col: str,
        build_residual: float | None = None,
        path: str | None = None,
    ):
        self.spark = spark
        self.centroids = centroids
        self.codebooks = codebooks
        self.encoded = encoded
        self.id_col = id_col
        self.vec_col = vec_col
        # mean relative PQ residual over the BUILD corpus: the baseline
        # the drift metric compares fresh ingest batches against
        self.build_residual = build_residual
        self.path = path  # set once saved/loaded; add() appends there

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 16,
        m: int = 8,
        n_codes: int = 16,
        seed: int = 42,
    ) -> "IvfPqIndex":
        """Train the coarse quantizer + codebooks (distributed k-means,
        tiny results to the driver) and encode every corpus vector to
        (cell, codes) in one narrow mapInPandas pass."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dvec = embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        train = dvec.select(array_to_vector("v").alias("fv"))
        km = KMeans(k=n_cells, seed=seed, maxIter=20, featuresCol="fv")
        centroids = np.stack([c for c in km.fit(train).clusterCenters()])
        cb = _fit_pq_codebooks(dvec, m, n_codes, seed)
        encoded = _encode_with(embeddings, centroids, cb, id_col, vec_col)
        residual = _mean_relative_residual(embeddings, cb, id_col, vec_col)
        return cls(
            embeddings.sparkSession,
            centroids,
            cb,
            encoded,
            id_col,
            vec_col,
            build_residual=residual,
        )

    # ------------------------------------------------------------ persist

    def save(self, path: str) -> None:
        from collective_als_spark.sources.logstore import logstore_for

        path = path.rstrip("/")
        # pending logical deletes travel with a save: the codes written
        # to the NEW path are the masked view, so publish() (which
        # saves into a fresh version dir) can never resurrect ids the
        # served index already deleted
        to_write = self._mask_codes(self.encoded)
        if "gen" not in to_write.columns:
            # a full rewrite is the free migration point: stamp the
            # generation column pre-gen indexes lack
            to_write = to_write.withColumn("gen", F.lit(0).cast("long"))
        # partitionBy("cell") = the serve path's cell filter becomes
        # directory-level partition pruning on every future search
        to_write.write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/codes"
        )
        # the JSON sidecar goes through the same filesystem layer as
        # the parquet (Hadoop FS for any URI scheme), so an index on
        # hdfs:/s3a: keeps quantizers and codes in ONE store
        log = logstore_for(self.spark, path)
        # a re-save over a previously-served path must not inherit the
        # old index's delete masks (they reference the OLD ids)
        if log.exists(f"{path}/_deletes"):
            log.delete(f"{path}/_deletes", recursive=True)
        log.write_text(
            f"{path}/quantizers.json",
            json.dumps(
                {
                    "centroids": self.centroids.tolist(),
                    "codebooks": self.codebooks.tolist(),
                    "id_col": self.id_col,
                    "vec_col": self.vec_col,
                    "build_residual": self.build_residual,
                }
            ),
        )
        # serve from (and append to) the persisted cell-partitioned codes
        self.path = path
        self.encoded = self.spark.read.parquet(f"{path}/codes")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfPqIndex":
        from collective_als_spark.sources.logstore import logstore_for

        path = path.rstrip("/")
        log = logstore_for(spark, path)
        try:
            meta = json.loads(log.read_text(f"{path}/quantizers.json"))
        except FileNotFoundError:
            raise FileNotFoundError(f"no ANN index at {path}")
        encoded = spark.read.parquet(f"{path}/codes")
        return cls(
            spark,
            np.asarray(meta["centroids"]),
            np.asarray(meta["codebooks"]),
            encoded,
            meta["id_col"],
            meta["vec_col"],
            build_residual=meta.get("build_residual"),
            path=path,
        )

    # ------------------------------------------------------------- ingest

    def add(self, new_vectors: DataFrame, replace: bool = False) -> dict:
        """Incremental ingest: assign the new vectors to EXISTING
        cells, encode with EXISTING codebooks, and append the codes —
        into the cell-partitioned parquet when the index is persisted
        (dynamic-partition append: new part files land inside the
        matching ``cell=<c>/`` directories, so serve-time directory
        pruning keeps working), or as a union for an in-memory index.
        Nothing is refit; a streaming corpus ingests without pausing
        serving. Each batch carries the next GENERATION stamp.

        ``replace=False`` (default): callers own id uniqueness —
        re-adding an id duplicates its codes, same as any append sink.
        ``replace=True`` is the id-UPSERT (r08 verdict: re-adding an
        id duplicated its codes with no fix short of a retrain): ids
        already present are first masked through the delete-mask path
        at their CURRENT generation, then the batch appends at the
        next one — the serve anti-join (``gen <= mask gen``)
        suppresses exactly the superseded rows while the fresh ones
        serve. O(batch) mask rows + the append, no code rewrite;
        :meth:`compact_codes` folds the superseded rows away
        physically. On a persisted index the mask lands before the
        append (a crash between them leaves the id deleted — re-run
        the batch; the reverse order would serve duplicates).
        Pre-generation indexes (saved before this column existed)
        must :meth:`compact_codes` once to migrate before replace.

        Returns the retrain signal::

            {"added": n, "replaced": masked, "batch_residual": r_b,
             "build_residual": r_0, "drift": r_b / r_0}

        ``drift`` near 1 → the frozen quantizers still fit the
        incoming distribution; sustained growth → reconstruction is
        degrading and a rebuild (build + save + atomic pointer swap)
        is due. The same one-pass statistic the build recorded, so the
        ratio is apples-to-apples.
        """
        n = new_vectors.count()
        if n == 0:
            raise ValueError("empty ingest batch")
        has_gen = "gen" in self.encoded.columns
        if replace and not has_gen:
            raise ValueError(
                "add(replace=True) needs generation-stamped codes; this "
                "index predates the gen column — run compact_codes() "
                "once to migrate it"
            )
        next_gen = 1
        if has_gen:
            cur_max = self.encoded.agg(F.max("gen").alias("g")).first()["g"]
            next_gen = int(cur_max or 0) + 1
        replaced = 0
        if replace:
            stats = self.delete(new_vectors)
            replaced = stats["masked"]
        fresh = _encode_with(
            new_vectors,
            self.centroids,
            self.codebooks,
            self.id_col,
            self.vec_col,
            gen=next_gen,
        )
        if not has_gen:
            # legacy persisted layout without the column: appending a
            # wider schema would leave the codes dir mixed — stay at
            # the old shape until a compaction migrates it
            fresh = fresh.drop("gen")
        if self.path is not None:
            fresh.write.mode("append").partitionBy("cell").parquet(
                f"{self.path}/codes"
            )
            self.encoded = self.spark.read.parquet(f"{self.path}/codes")
        else:
            self.encoded = self.encoded.unionByName(fresh)
        batch_residual = _mean_relative_residual(
            new_vectors, self.codebooks, self.id_col, self.vec_col
        )
        drift = (
            batch_residual / self.build_residual
            if self.build_residual
            else float("nan")
        )
        return {
            "added": n,
            "replaced": replaced,
            "batch_residual": batch_residual,
            "build_residual": self.build_residual,
            "drift": drift,
        }

    def delete(self, ids: DataFrame) -> dict:
        """Logical deletion by id — the snapshot table's deletion-vector
        pattern applied to the index (r07 verdict: rows removed by
        dedup / decontamination kept being served until a full
        retrain). Nothing in ``codes/`` is rewritten: the deleted ids
        are resolved to their cells (one distributed join against the
        encoded codes) and appended as a cell-partitioned mask under
        ``<path>/_deletes/cell=<c>/``. The serve path anti-joins the
        masks of the PROBED cells only — the same directory-level
        partition pruning as the codes themselves — so a delete of a
        few thousand ids costs a tiny mask file, not an index rewrite.
        :meth:`compact_codes` folds the masks away physically.

        ``ids``: any frame carrying an ``id_col`` column (extra
        columns ignored). Ids absent from the index are no-ops.
        Masks are BY ID: re-:meth:`add`-ing a deleted id is a caller
        error (the same id-uniqueness contract :meth:`add` states —
        and the mask would suppress or, at compaction, drop the new
        row too). To re-insert a deleted id, :meth:`compact_codes`
        first (folds the mask away), then add.

        In-memory (never-saved) indexes apply the anti-join to the
        encoded frame directly. Returns ``{"requested": distinct ids,
        "masked": rows actually present and now masked}``.
        """
        key = ids.select(F.col(self.id_col).alias("nid")).distinct()
        n_req = key.count()  # ids-only job, no corpus scan
        # materialize the ids-vs-corpus join ONCE (localCheckpoint);
        # the stat count and the mask write both reuse it. Mask rows
        # carry the masked row's OWN generation: the serve anti-join
        # (gen <= mask gen) then suppresses exactly the rows that
        # existed when the mask was written — a later add(replace=True)
        # of the same id serves its fresh higher-generation row
        mask_cols = ["nid", "cell"] + (
            ["gen"] if "gen" in self.encoded.columns else []
        )
        masked = (
            self.encoded.select(*mask_cols).join(key, "nid").localCheckpoint()
        )
        n_masked = masked.count()
        if self.path is None:
            self.encoded = self.encoded.join(key, "nid", "left_anti")
        elif n_masked:
            masked.write.mode("append").partitionBy("cell").parquet(
                f"{self.path}/_deletes"
            )
        return {"requested": n_req, "masked": n_masked}

    def _delete_masks(self) -> DataFrame | None:
        """The persisted (nid, cell) delete masks, or None when the
        index has none. In-memory indexes apply deletes eagerly, so
        only saved indexes carry masks."""
        if self.path is None:
            return None
        from collective_als_spark.sources.logstore import logstore_for

        d = f"{self.path}/_deletes"
        if not logstore_for(self.spark, self.path).exists(d):
            return None
        return self.spark.read.parquet(d)

    def _mask_codes(self, enc: DataFrame, cells=None) -> DataFrame:
        """Anti-join the delete masks out of a codes frame — shared by
        both serve paths, save(), and compact_codes(). Generation-aware
        when both sides carry ``gen`` (mask suppresses only rows at or
        below its generation — the id-upsert contract); legacy
        by-id otherwise. ``cells`` bounds the mask scan to the probed
        cells (directory-level pruning, same as the codes)."""
        masks = self._delete_masks()
        if masks is None:
            return enc
        if cells is not None:
            masks = masks.filter(F.col("cell").isin(cells))
        if "gen" in masks.columns and "gen" in enc.columns:
            m = masks.select(
                F.col("nid").alias("__mnid"), F.col("gen").alias("__mgen")
            )
            return enc.join(
                m,
                (enc["nid"] == m["__mnid"]) & (enc["gen"] <= m["__mgen"]),
                "left_anti",
            )
        return enc.join(masks.select("nid").distinct(), "nid", "left_anti")

    # -------------------------------------------------------- maintenance

    def compact_codes(self) -> dict:
        """Fold the small per-cell part files repeated :meth:`add`
        batches accumulate back into ~one file per cell (r05 verdict
        #7): every streaming ingest appends a part file into each
        touched ``cell=<c>/`` directory, and after hundreds of batches
        the serve-time scan pays per-file open cost that dwarfs the
        data. One ``repartition(n_cells, "cell")`` pass rewrites the
        codes clustered by cell (each cell's rows in exactly one task
        → one file per cell directory), staged to a sibling dir and
        swapped in. Search results are identical — same rows, same
        partition pruning, fewer files.

        The swap (delete + rename) is NOT atomic for concurrent
        readers of THIS version dir; compact a serving index by
        publishing the compacted index as a new version instead
        (``publish`` + ``load_current``), which is atomic."""
        if self.path is None:
            raise ValueError(
                "compact_codes needs a persisted index (save() first)"
            )
        from collective_als_spark.sources.logstore import logstore_for

        codes_dir = f"{self.path}/codes"
        codes = self.spark.read.parquet(codes_dir)
        files_before = len(codes.inputFiles())
        # fold the logical delete masks away physically (generation-
        # aware: only rows at or below each mask's gen drop — a
        # replaced id keeps its fresh row): masked rows are dropped
        # from the rewrite and the mask dir is removed, so
        # post-compaction serving needs no anti-join at all (the
        # snapshot table's DV-materializing compact, same shape)
        masks = self._delete_masks()
        if masks is not None:
            codes = self._mask_codes(codes)
        if "gen" not in codes.columns:
            # migration point for pre-generation indexes: the rewrite
            # stamps gen=0 so add(replace=True) works afterwards
            codes = codes.withColumn("gen", F.lit(0).cast("long"))
        n_cells = int(self.centroids.shape[0])
        staged = f"{self.path}/codes.compact.{uuid.uuid4().hex}"
        codes.repartition(n_cells, "cell").write.mode("error").partitionBy(
            "cell"
        ).parquet(staged)
        log = logstore_for(self.spark, self.path)
        log.delete(codes_dir, recursive=True)
        log.rename(staged, codes_dir)
        if masks is not None:
            log.delete(f"{self.path}/_deletes", recursive=True)
        self.encoded = self.spark.read.parquet(codes_dir)
        files_after = len(self.encoded.inputFiles())
        return {
            "files_before": files_before,
            "files_after": files_after,
            "masks_folded": masks is not None,
        }

    def retrain_if_drifted(
        self,
        corpus: DataFrame,
        root: str,
        drift: float,
        threshold: float = 1.25,
        seed: int = 42,
    ) -> int | None:
        """Act on the drift signal :meth:`add` returns (r05 verdict
        #7): when ``drift`` (batch residual / build residual) exceeds
        ``threshold``, the frozen quantizers no longer fit the incoming
        distribution — rebuild them from ``corpus`` (the full CURRENT
        vector set; codes are lossy, so a retrain needs the originals)
        with the same index shape, and publish the fresh index under
        ``root`` as a new version (atomic pointer swap; serving
        processes keep reading the old version until the commit).
        Returns the published version, or None when the drift is under
        the threshold (no work done)."""
        if not drift > threshold:
            return None
        fresh = type(self).build(
            corpus,
            id_col=self.id_col,
            vec_col=self.vec_col,
            n_cells=int(self.centroids.shape[0]),
            m=int(self.codebooks.shape[0]),
            n_codes=int(self.codebooks.shape[1]),
            seed=seed,
        )
        return fresh.publish(root)

    # ----------------------------------------------------- versioned serve

    def publish(self, root: str) -> int:
        """Zero-downtime retrain publish: save this index into
        ``<root>/v<N>/`` and commit it by exclusively creating
        ``<root>/v<N>.json`` — the same CAS primitive as the snapshot
        table's manifests, via the same per-scheme LogStore. Serving
        processes calling :meth:`load_current` keep reading the old
        version until the new manifest lands atomically; racing
        publishers serialize (the loser retries with the next number).
        Old versions stay loadable for rollback until deleted."""
        from collective_als_spark.sources.logstore import (
            CommitConflict,
            logstore_for,
        )

        root = root.rstrip("/")
        log = logstore_for(self.spark, root)
        log.mkdirs(root)
        for _ in range(20):
            versions = [
                int(n[1:-5])
                for n in log.list_dir(root)
                if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
            ]
            version = max(versions, default=0) + 1
            self.save(f"{root}/v{version}")
            try:
                log.write_text_exclusive(
                    f"{root}/v{version}.json",
                    json.dumps({"version": version, "path": f"{root}/v{version}"}),
                )
            except CommitConflict:
                continue  # lost the race; next number
            return version
        raise CommitConflict(f"publish to {root} lost 20 CAS races")

    @classmethod
    def load_current(cls, spark: SparkSession, root: str) -> "IvfPqIndex":
        """Open the latest PUBLISHED version (max committed manifest).
        A publisher mid-save is invisible — only the atomic manifest
        creation makes a version current."""
        from collective_als_spark.sources.logstore import logstore_for

        root = root.rstrip("/")
        log = logstore_for(spark, root)
        versions = [
            int(n[1:-5])
            for n in log.list_dir(root)
            if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
        ]
        if not versions:
            raise FileNotFoundError(f"no published ANN index under {root}")
        meta = json.loads(log.read_text(f"{root}/v{max(versions)}.json"))
        return cls.load(spark, meta["path"])

    # -------------------------------------------------------------- serve

    def search(
        self,
        queries: DataFrame,
        vectors: DataFrame,
        k: int = 5,
        n_probe: int = 6,
        rerank_depth: int = 50,
        where: "str | object | None" = None,
    ) -> DataFrame:
        """Top-k neighbors for a bounded query batch.

        ``queries``: (id_col, vec_col) — the batch to answer; collected
        driver-side (capped at {_MAX_QUERY_BATCH}) to form per-query ADC
        lookup tables shipped in the scan closure.
        ``vectors``: the original embedding table (id_col, vec_col),
        used ONLY for the exact rerank join over the bounded candidate
        set — the ADC scan itself never touches a float vector.

        ``where`` — attribute-filtered search (SINGLE-STAGE filtering,
        not post-filtering): a SQL boolean expression or Column
        evaluated against ``vectors``; only corpus rows passing it are
        scanned and scored, so the result is a FULL top-k among the
        allowed rows — a post-filter of an unfiltered top-k would
        instead return fewer than k (or zero) hits under a selective
        predicate. Plan shape: one semi-join of the (pruned) byte
        codes against the allowed ids — the exact mechanism the delete
        masks use, with AQE free to broadcast a small allowed set.

        Self-pairs (query id == neighbor id) are excluded, matching
        `ivfadc_topk`.
        """
        id_col, vec_col = self.id_col, self.vec_col
        m, n_codes, sub = self.codebooks.shape
        n_cells = self.centroids.shape[0]
        n_probe = min(n_probe, n_cells)

        qrows = queries.select(id_col, vec_col).limit(_MAX_QUERY_BATCH + 1).collect()
        if len(qrows) > _MAX_QUERY_BATCH:
            raise ValueError(
                f"query batch exceeds {_MAX_QUERY_BATCH}; split the batch "
                f"(per-query LUTs are driver/closure state)"
            )
        if not qrows:
            raise ValueError("empty query batch")
        # a duplicated query id would produce duplicate LUT rows and
        # duplicate candidates, and the rerank's row_number would then
        # fill top-k slots with copies of one neighbor — dedupe by id
        # (first row wins) so each id is answered exactly once
        by_id: dict = {}
        for r in qrows:
            by_id.setdefault(r[id_col], r)
        qrows = list(by_id.values())
        q_ids = np.array([r[id_col] for r in qrows])
        q_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])

        qn = q_mat / (np.sqrt((q_mat**2).sum(-1, keepdims=True)) + 1e-12)
        cn = self.centroids / (
            np.sqrt((self.centroids**2).sum(-1, keepdims=True)) + 1e-12
        )
        order = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]
        probe_mask = np.zeros((len(q_ids), n_cells), dtype=bool)
        np.put_along_axis(probe_mask, order, True, axis=1)
        probed_any = sorted({int(c) for c in order.ravel()})

        cb = self.codebooks
        q_parts = q_mat.reshape(len(q_ids), m, sub)
        lut = np.einsum("qjs,jcs->qjc", q_parts, cb)
        cb_norm2 = (cb**2).sum(-1)
        q_norm = np.sqrt((q_mat**2).sum(-1))
        depth = rerank_depth

        def adc_scan(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(pdf["codes"].values)
                nids = pdf["nid"].values
                cells = pdf["cell"].values.astype(np.int64)
                dots = lut[:, np.arange(m)[None, :], codes].sum(-1)
                recon_norm = np.sqrt(
                    cb_norm2[np.arange(m)[None, :], codes].sum(-1)
                )
                scores = dots / (q_norm[:, None] * recon_norm[None, :] + 1e-12)
                scores = np.where(probe_mask[:, cells], scores, -np.inf)
                scores = np.where(
                    nids[None, :] == q_ids[:, None], -np.inf, scores
                )
                top = min(depth, scores.shape[1])
                idx = np.argpartition(-scores, top - 1, axis=1)[:, :top]
                keep = np.take_along_axis(scores, idx, axis=1) > -np.inf
                qq = np.repeat(q_ids, top).reshape(len(q_ids), top)
                yield pd.DataFrame(
                    {
                        "query_id": qq[keep].ravel(),
                        "neighbor_id": nids[idx][keep].ravel(),
                    }
                )

        # on a saved index this filter is directory-level partition
        # pruning (codes/cell=<c>/); in-memory it's a plain filter
        sel = ["nid", "codes", "cell"] + (
            ["gen"] if "gen" in self.encoded.columns else []
        )
        enc = self.encoded.filter(F.col("cell").isin(probed_any)).select(*sel)
        # logically-deleted / superseded rows never reach the ADC scan:
        # generation-aware anti-join against the delete masks of the
        # PROBED cells (the same partition pruning as the codes — a
        # mask scan is O(probed masks), not O(all deletes)). Masks are
        # tiny next to the corpus; AQE picks broadcast when they fit.
        enc = self._mask_codes(enc, cells=probed_any)
        enc = self._apply_where(enc, vectors, where)
        cand = enc.mapInPandas(adc_scan, _CAND_SCHEMA)

        return self._exact_rerank(cand, queries, vectors, k)

    def _apply_where(self, enc: DataFrame, vectors: DataFrame, where):
        """Single-stage attribute filter: semi-join the byte codes
        against the ids of ``vectors`` rows passing ``where`` — shared
        by both serve paths."""
        if where is None:
            return enc
        pred = F.expr(where) if isinstance(where, str) else where
        allowed = vectors.filter(pred).select(
            F.col(self.id_col).alias("nid")
        )
        return enc.join(allowed, "nid", "left_semi")

    def search_distributed(
        self,
        queries: DataFrame,
        vectors: DataFrame,
        k: int = 5,
        n_probe: int = 6,
        rerank_depth: int = 50,
        query_chunk: int = 1024,
        where: "str | object | None" = None,
    ) -> DataFrame:
        """Top-k neighbors for an UNBOUNDED query frame — the
        corpus-scale serve path. :meth:`search` ships per-query ADC
        lookup tables in the scan closure, so its driver state grows
        with the batch (capped at {_MAX_QUERY_BATCH}); here every
        query row travels WITH its vector through a cell-cogrouped
        scan and nothing query-sized ever touches the driver:

        1. probe assignment — the ``n_probe`` nearest cells per query,
           one narrow map-only Arrow pass (the same `_assign_cells`
           the build uses);
        2. cogroup by cell — the queries probing a cell meet that
           cell's byte codes in one task
           (``groupBy(cell).cogroup(codes.groupBy(cell))
           .applyInPandas``). LUTs are built per (cell, query-chunk)
           INSIDE the task; per-task memory is one cell's codes plus
           ``query_chunk`` query vectors, independent of the total
           batch size;
        3. local top-``rerank_depth`` per (query, cell), then the
           shared exact-cosine rerank to final top-k.

        Scale shape: shuffle = queries x n_probe rows plus the probed
        cells' codes; a hot cell is bounded by chunking its queries,
        and cell width itself is the build-time ``n_cells`` knob (the
        usual sqrt(corpus) sizing). Results match :meth:`search` for
        the same parameters (asserted in tests/test_ann_index.py);
        prefer :meth:`search` for small interactive batches — closure
        shipping beats a cogroup shuffle until the batch is large.
        Delete masks and the ``where`` attribute filter apply exactly
        as in :meth:`search`.
        """
        id_col, vec_col = self.id_col, self.vec_col
        m, n_codes, sub = self.codebooks.shape
        n_cells = int(self.centroids.shape[0])
        n_probe = min(n_probe, n_cells)
        cb = self.codebooks
        cb_norm2 = (cb**2).sum(-1)
        depth = rerank_depth
        chunk = max(1, int(query_chunk))

        q = queries.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_qv")
        ).dropDuplicates([id_col])
        probes = _assign_cells(q, self.centroids, id_col, "_qv", n_probe)
        qcell = probes.join(
            q.select(F.col(id_col).alias("vid"), "_qv"), "vid"
        ).select("vid", "cell", "_qv")

        sel = ["nid", "codes", "cell"] + (
            ["gen"] if "gen" in self.encoded.columns else []
        )
        enc = self._mask_codes(self.encoded.select(*sel))
        enc = self._apply_where(enc, vectors, where)

        def score_cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left) or not len(right):
                return pd.DataFrame(
                    {"query_id": pd.Series(dtype="int64"),
                     "neighbor_id": pd.Series(dtype="int64")}
                )
            codes = np.stack(right["codes"].values)
            nids = right["nid"].values
            recon_norm = np.sqrt(cb_norm2[np.arange(m)[None, :], codes].sum(-1))
            out_q, out_n = [], []
            for s in range(0, len(left), chunk):
                part = left.iloc[s : s + chunk]
                q_ids = part["vid"].values
                q_mat = np.stack(part["_qv"].values).astype(np.float64)
                q_parts = q_mat.reshape(len(q_ids), m, sub)
                lut = np.einsum("qjs,jcs->qjc", q_parts, cb)
                q_norm = np.sqrt((q_mat**2).sum(-1))
                dots = lut[:, np.arange(m)[None, :], codes].sum(-1)
                scores = dots / (q_norm[:, None] * recon_norm[None, :] + 1e-12)
                scores = np.where(
                    nids[None, :] == q_ids[:, None], -np.inf, scores
                )
                top = min(depth, scores.shape[1])
                idx = np.argpartition(-scores, top - 1, axis=1)[:, :top]
                keep = np.take_along_axis(scores, idx, axis=1) > -np.inf
                qq = np.repeat(q_ids, top).reshape(len(q_ids), top)
                out_q.append(qq[keep].ravel())
                out_n.append(nids[idx][keep].ravel())
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                }
            )

        cand = (
            qcell.groupBy("cell")
            .cogroup(enc.groupBy("cell"))
            .applyInPandas(score_cell, _CAND_SCHEMA)
            # a query can meet the same neighbor in only one cell (each
            # code row lives in its home cell), so no dedupe is needed
        )
        return self._exact_rerank(cand, queries, vectors, k)

    def _exact_rerank(
        self, cand: DataFrame, queries: DataFrame, vectors: DataFrame, k: int
    ) -> DataFrame:
        """Exact-cosine rerank of a bounded candidate frame
        (query_id, neighbor_id) to final top-k — shared tail of
        :meth:`search` and :meth:`search_distributed`.

        Query-side rerank vectors come from the QUERY BATCH itself,
        not the corpus table — out-of-corpus query ids (the
        build-once/serve-many case) must rerank against their own
        vector, and an id that happens to collide with an unrelated
        corpus row must not score against the wrong one."""
        id_col, vec_col = self.id_col, self.vec_col
        e_q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ).dropDuplicates(["query_id"])  # mirror the candidate-side dedupe
        e_c = vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        scored = (
            cand.join(e_q, "query_id")
            .join(e_c, "neighbor_id")
            .withColumn(
                "cos", F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 4)
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(
                "query_id", "neighbor_id", "cos", F.col("rk").cast("int").alias("rk")
            )
        )
