"""CollectiveALS — N-entity collective matrix factorization on PySpark.

Public surface mirrors the reference (``CollectiveALS.scala:25-133``,
``CollectiveALSModel.scala:11-75``): N named entities, multiple sparse
rating relations keyed by (leftCol, rightCol), fluent setters, ``fit``
→ model with one (id, features) DataFrame per entity, ``predict`` for
any entity pair with NaN cold start.

Execution is Spark-first, not a port of the reference's RDD block
machinery (in/out-blocks, CSC, TimSort — reference
``CollectiveALS.scala:481-961`` — are physical details of 2016-era
MLlib and are *not* reproduced):

  - 2-entity single-relation fits delegate to
    ``pyspark.ml.recommendation.ALS`` (same algorithm family the
    reference copied from; Scala-side, battle-tested at scale).
  - N-entity fits run a driver-side Gauss-Seidel loop over entities
    (reference ``CollectiveALS.scala:409-425``). Per target entity:
    join the other side's current factors onto each touching relation
    (the DataFrame analog of the out-block "send" step at ``:985-991``),
    union contributions across relations (replaces the fullOuterJoin
    merge at ``:1037-1047`` — union → grouped solve is the idiomatic
    equivalent), hash-repartition by target id into blocks, and solve
    all normal equations of a block in one Arrow batch
    (``applyInPandas`` + vectorized numpy — see cmf/solver.py).
  - Lineage is truncated with eager ``localCheckpoint`` per entity
    update, exactly where the reference calls
    ``localCheckpoint(); count()`` (``:421-422``).

Scale notes (100 TB stance): contributions shuffle once per (iter ×
entity × relation) on the target id — the same asymptotic shuffle the
reference performs; blocks are sized by ``num_blocks`` (reference
default 2000, ``:29-30``) so each Arrow batch fits executor memory;
factor tables stay partitioned by id hash, and the predict join lets
Catalyst/AQE choose broadcast vs shuffle per side.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from collective_als_spark.cmf import solver as S
from collective_als_spark.functions.vector import checked_cast, dot

_FACTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def _check_numeric(df: DataFrame, col: str) -> None:
    """Schema validation — reference ``SchemaUtils.checkNumericType``
    (``spark/SchemaUtils.scala:47-55``)."""
    field = df.schema[col]
    if not isinstance(field.dataType, T.NumericType):
        raise TypeError(
            f"Column {col!r} must be numeric but is {field.dataType.simpleString()}"
        )


class CollectiveALSModel:
    """Fitted model: ``rank`` + one (id, features) DataFrame per entity.

    Reference: ``CollectiveALSModel.scala:11-75``.
    """

    def __init__(
        self,
        rank: int,
        entities: list[str],
        factors: dict[str, DataFrame],
        prediction_col: str = "prediction",
    ):
        self.rank = rank
        self.entities = list(entities)
        self.factors = factors
        self.prediction_col = prediction_col

    def factors_for(self, entity: str) -> DataFrame:
        if entity not in self.factors:
            raise KeyError(f"unknown entity {entity!r}; have {self.entities}")
        return self.factors[entity]

    def set_prediction_col(self, value: str) -> "CollectiveALSModel":
        self.prediction_col = value
        return self

    def predict(
        self,
        dataset: DataFrame,
        left_entity: str | None = None,
        right_entity: str | None = None,
        left_col: str | None = None,
        right_col: str | None = None,
    ) -> DataFrame:
        """Append ``prediction_col`` = dot(leftFactors, rightFactors).

        Two left joins + a codegen'd dot product — the same Catalyst plan
        shape as reference ``CollectiveALSModel.transform``
        (``CollectiveALSModel.scala:54-67``); cold-start IDs yield NaN.
        """
        left_entity = left_entity or self.entities[0]
        right_entity = right_entity or self.entities[1]
        left_col = left_col or left_entity
        right_col = right_col or right_entity
        _check_numeric(dataset, left_col)
        _check_numeric(dataset, right_col)
        if self.prediction_col in dataset.columns:
            raise ValueError(f"column {self.prediction_col!r} already exists")

        lf = self.factors_for(left_entity).select(
            F.col("id").alias("_lid"), F.col("features").alias("_lfeat")
        )
        rf = self.factors_for(right_entity).select(
            F.col("id").alias("_rid"), F.col("features").alias("_rfeat")
        )
        out = (
            dataset.join(lf, checked_cast(dataset[left_col]) == F.col("_lid"), "left")
            .join(rf, checked_cast(dataset[right_col]) == F.col("_rid"), "left")
            .withColumn(
                self.prediction_col,
                dot(F.col("_lfeat"), F.col("_rfeat")).cast("float"),
            )
            .drop("_lid", "_lfeat", "_rid", "_rfeat")
        )
        return out

    # pyspark.ml-style alias
    def transform(self, dataset: DataFrame) -> DataFrame:
        return self.predict(dataset)

    def save(self, path: str, mode: str = "error") -> None:
        """Persist the model: one parquet dir per entity's factors plus a
        single-row JSON metadata dir — all via Spark writers, so the
        target can be any Hadoop-compatible FS (local, HDFS, S3). The
        reference has no persistence surface (its IHR jobs write only a
        metrics report, ``IHRCollectiveALS.scala:91-94``); this follows
        the ``pyspark.ml`` Estimator/Model convention instead."""
        import json

        some_df = next(iter(self.factors.values()))
        spark = some_df.sparkSession
        meta = {
            "rank": self.rank,
            "entities": self.entities,
            "prediction_col": self.prediction_col,
        }
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode(mode).text(f"{path}/metadata")
        for entity in self.entities:
            self.factors[entity].write.mode(mode).parquet(f"{path}/factors/{entity}")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "CollectiveALSModel":
        import json

        meta = json.loads(spark.read.text(f"{path}/metadata").first()[0])
        factors = {
            e: spark.read.parquet(f"{path}/factors/{e}") for e in meta["entities"]
        }
        return cls(
            rank=meta["rank"],
            entities=meta["entities"],
            factors=factors,
            prediction_col=meta["prediction_col"],
        )


class CollectiveALS:
    """Estimator. Defaults follow the reference class defaults
    (``CollectiveALS.scala:27-58``) with quirk fixes Q4/Q7 (seed
    defaults to 0, not classname hash; train/reg default unified)."""

    def __init__(
        self,
        *entities: str,
        rank: int = 10,
        max_iter: int = 10,
        reg_param: float = 0.1,
        implicit_prefs: bool = False,
        alpha: float = 1.0,
        nonnegative: bool = False,
        rating_col: str = "rating",
        prediction_col: str = "prediction",
        num_blocks: int | str | dict[str, int] = 32,
        seed: int = 0,
        checkpoint_interval: int = 10,
        intermediate_storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        final_storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        force_native: bool = False,
    ):
        self.entities = list(entities) if entities else ["user", "item"]
        self.rank = rank
        self.max_iter = max_iter
        self.reg_param = reg_param
        self.implicit_prefs = implicit_prefs
        self.alpha = alpha
        self.nonnegative = nonnegative
        self.rating_col = rating_col
        self.prediction_col = prediction_col
        self.num_blocks = num_blocks
        # Fallback for entities absent from a per-entity dict; tracks the
        # last globally-configured value (ctor arg or set_num_blocks(int)).
        self._num_blocks_default = num_blocks if not isinstance(num_blocks, dict) else 32
        self.seed = seed
        self.checkpoint_interval = checkpoint_interval
        self.intermediate_storage_level = intermediate_storage_level
        self.final_storage_level = final_storage_level
        self.force_native = force_native

    # ---- fluent setters (reference's 17 setters, CollectiveALS.scala:60-83)
    def set_rank(self, v):           self.rank = v; return self
    def set_max_iter(self, v):       self.max_iter = v; return self
    def set_reg_param(self, v):      self.reg_param = v; return self
    def set_implicit_prefs(self, v): self.implicit_prefs = v; return self
    def set_alpha(self, v):          self.alpha = v; return self
    def set_nonnegative(self, v):    self.nonnegative = v; return self
    def set_rating_col(self, v):     self.rating_col = v; return self
    def set_prediction_col(self, v): self.prediction_col = v; return self

    def set_num_blocks(self, v, entity: str | None = None):
        """Block count, global (int) or per entity — reference exposes
        ``numBlocks`` per entity (``CollectiveALS.scala:29-30,63-66``;
        production configs set 2000). ``set_num_blocks(8)`` sets all;
        ``set_num_blocks(8, "user")`` sets one entity."""
        if entity is not None:
            if not isinstance(self.num_blocks, dict):
                # Keep the previously-configured global value as the
                # fallback for entities not named in the dict, so
                # CollectiveALS(num_blocks=64).set_num_blocks(8, "user")
                # trains the other entities with 64, not a hardcoded 32.
                self._num_blocks_default = self.num_blocks
                self.num_blocks = {}
            self.num_blocks[entity] = v
        else:
            self._num_blocks_default = v
            self.num_blocks = v
        return self
    def set_seed(self, v):           self.seed = v; return self
    def set_checkpoint_interval(self, v): self.checkpoint_interval = v; return self
    def set_intermediate_storage_level(self, v): self.intermediate_storage_level = v; return self
    def set_final_storage_level(self, v): self.final_storage_level = v; return self

    @staticmethod
    def _storage_level_name(level: StorageLevel) -> str:
        """StorageLevel -> the string name pyspark.ml ALS expects."""
        for name in (
            "MEMORY_AND_DISK", "MEMORY_ONLY", "DISK_ONLY",
            "MEMORY_AND_DISK_2", "MEMORY_ONLY_2", "DISK_ONLY_2", "NONE",
        ):
            if getattr(StorageLevel, name, None) == level:
                return name
        return "MEMORY_AND_DISK"

    # ------------------------------------------------------------------ fit
    def fit(
        self,
        relations: DataFrame | dict[tuple[str, str], DataFrame],
    ) -> CollectiveALSModel:
        """Fit on one DataFrame (2-entity convenience, reference
        ``CollectiveALS.scala:94``) or a dict {(leftCol, rightCol): df}
        (N-entity, reference ``:96-133``). Column names must be entity
        names; ``rating_col`` may be "" for implicit all-ones ratings
        (reference ``:104``)."""
        if isinstance(relations, DataFrame):
            relations = {(self.entities[0], self.entities[1]): relations}
        norm: list[tuple[int, int, DataFrame]] = []
        for (lcol, rcol), df in relations.items():
            if lcol not in self.entities or rcol not in self.entities:
                raise ValueError(
                    f"relation ({lcol},{rcol}) references unknown entity; "
                    f"entities={self.entities}"
                )
            _check_numeric(df, lcol)
            _check_numeric(df, rcol)
            if self.rating_col:
                _check_numeric(df, self.rating_col)
                rating = F.col(self.rating_col).cast("float")
            else:
                rating = F.lit(1.0).cast("float")
            li, ri = self.entities.index(lcol), self.entities.index(rcol)
            nd = df.select(
                checked_cast(F.col(lcol)).alias("src"),
                checked_cast(F.col(rcol)).alias("dst"),
                rating.alias("rating"),
            ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            norm.append((li, ri, nd))

        if (
            not self.force_native
            and len(self.entities) == 2
            and len(norm) == 1
            and norm[0][0] != norm[0][1]
        ):
            return self._fit_builtin(norm[0])
        return self._fit_native(norm)

    # ------------------------------------------------- 2-entity fast path
    def _fit_builtin(self, rel: tuple[int, int, DataFrame]) -> CollectiveALSModel:
        from pyspark.ml.recommendation import ALS

        li, ri, df = rel
        als = ALS(
            rank=self.rank,
            maxIter=self.max_iter,
            regParam=self.reg_param,
            implicitPrefs=self.implicit_prefs,
            alpha=self.alpha,
            nonnegative=self.nonnegative,
            userCol="src",
            itemCol="dst",
            ratingCol="rating",
            numUserBlocks=self._blocks_for(self.entities[li], df.sparkSession),
            numItemBlocks=self._blocks_for(self.entities[ri], df.sparkSession),
            checkpointInterval=self.checkpoint_interval,
            seed=self.seed,
            coldStartStrategy="nan",
            intermediateStorageLevel=self._storage_level_name(
                self.intermediate_storage_level
            ),
            finalStorageLevel=self._storage_level_name(self.final_storage_level),
        )
        m = als.fit(df)
        cast_feat = F.col("features").cast(T.ArrayType(T.FloatType())).alias("features")
        factors = {
            self.entities[li]: m.userFactors.select("id", cast_feat),
            self.entities[ri]: m.itemFactors.select("id", cast_feat),
        }
        return CollectiveALSModel(self.rank, self.entities, factors, self.prediction_col)

    # ------------------------------------------------- N-entity trainer
    def _blocks_for(self, entity_name: str, spark=None) -> int:
        """Per-entity block count (reference ``CollectiveALS.scala:29-30``):
        dict values override, unnamed entities use the class default.

        ``"auto"`` scales with the cluster instead of hardcoding: block
        count = max(8, defaultParallelism // 4) — 8 on a 32-core local
        run (block-scheduling overhead dominates tiny fits below that),
        2000 on a reference-production-sized cluster (200 executors x
        ~40 cores), which is exactly the reference's production setting
        (``IHRALS.scala:29``)."""
        v = self.num_blocks
        if isinstance(v, dict):
            unknown = set(v) - set(self.entities)
            if unknown:
                raise ValueError(
                    f"num_blocks names unknown entities {sorted(unknown)}; "
                    f"entities={self.entities}"
                )
            v = v.get(entity_name, self._num_blocks_default)
        if v == "auto":
            par = (
                spark.sparkContext.defaultParallelism if spark is not None else 32
            )
            return max(8, par // 4)
        return int(v)

    def _fit_native(
        self, relations: list[tuple[int, int, DataFrame]]
    ) -> CollectiveALSModel:
        spark = relations[0][2].sparkSession
        n_ent = len(self.entities)

        cached = []
        for li, ri, df in relations:
            c = df.persist(self.intermediate_storage_level)
            cached.append((li, ri, c))

        # entity universes: union + distinct per entity (reference :394-402)
        factors: dict[int, DataFrame] = {}
        for e in range(n_ent):
            sides = []
            for li, ri, df in cached:
                if li == e:
                    sides.append(df.select(F.col("src").alias("id")))
                if ri == e:
                    sides.append(df.select(F.col("dst").alias("id")))
            if not sides:
                raise ValueError(f"entity {self.entities[e]!r} appears in no relation")
            ids = sides[0]
            for s in sides[1:]:
                ids = ids.union(s)
            ids = ids.distinct()
            factors[e] = self._initialize(ids, e).localCheckpoint(eager=True)

        rank, reg, alpha = self.rank, self.reg_param, self.alpha
        implicit, nonneg = self.implicit_prefs, self.nonnegative

        # Reliable checkpointing (r03 verdict #3): the reference SETTABLE
        # checkpointInterval is dead code on its own loop — it always
        # localCheckpoints (quirk Q2, CollectiveALS.scala:421-422; the
        # commented-out interval design at :446-468 shows the intent).
        # localCheckpoint blocks die with a lost executor, so a
        # 100-iteration production fit (IHRCollectiveALS.scala:53-58)
        # restarts from scratch on any failure. Here the interval is
        # honored the way the reference intended: when a checkpoint dir
        # is configured, every checkpoint_interval-th (iter x entity)
        # update writes a RELIABLE checkpoint (survives executor loss,
        # bounds recovery to one interval); other updates keep the cheap
        # localCheckpoint. With no checkpoint dir the behavior is
        # exactly quirk-Q2 (localCheckpoint every update).
        reliable_every = (
            int(self.checkpoint_interval)
            if spark.sparkContext.getCheckpointDir() is not None
            and self.checkpoint_interval
            and int(self.checkpoint_interval) > 0
            else 0
        )
        update_step = 0

        for _ in range(self.max_iter):
            for e in range(n_ent):
                # relations touching e: (other_entity, flipped df with dst=e-side)
                touching: list[tuple[int, DataFrame]] = []
                for li, ri, df in cached:
                    if ri == e:
                        touching.append((li, df))
                    if li == e:
                        touching.append(
                            (ri, df.select(
                                F.col("dst").alias("src"),
                                F.col("src").alias("dst"),
                                "rating",
                            ))
                        )
                ytys: list[np.ndarray | None] = []
                contribs = []
                for rel_idx, (other, rdf) in enumerate(touching):
                    of = factors[other]
                    if implicit:
                        ytys.append(self._compute_yty(of))
                    else:
                        ytys.append(None)
                    contribs.append(
                        rdf.join(of.hint("shuffle_hash"), rdf["src"] == of["id"])
                        .select(
                            rdf["dst"].alias("id"),
                            rdf["rating"],
                            of["features"],
                            F.lit(rel_idx).alias("rel"),
                        )
                    )
                allc = contribs[0]
                for c in contribs[1:]:
                    allc = allc.union(c)

                yty_arr = (
                    np.stack([y for y in ytys]) if implicit else None
                )

                def solve_block(pdf: pd.DataFrame, _yty=yty_arr) -> pd.DataFrame:
                    if len(pdf) == 0:
                        return pd.DataFrame({"id": [], "features": []})
                    order = np.argsort(pdf["id"].values, kind="stable")
                    ids = pdf["id"].values[order]
                    X = np.stack(pdf["features"].values[order]).astype(np.float64)
                    r = pdf["rating"].values[order].astype(np.float64)
                    rel = pdf["rel"].values[order]
                    starts = S._segment_starts(ids)
                    uids = ids[starts]
                    g = len(uids)
                    k = X.shape[1]
                    if _yty is None:
                        uids2, AtA, Atb, counts = S.build_normal_equations(ids, X, r)
                        nexpl = counts.astype(np.float64)
                    else:
                        c1 = alpha * np.abs(r)
                        pos = r > 0
                        w = np.where(pos, c1, 0.0)
                        # reference add(a, b=(c1+1)/c1, c=c1): Atb += c*b*a
                        # = (c1+1)*a; kernel multiplies weight*target, so
                        # target = (c1+1)/c1 (safe-div; w=0 rows contribute 0)
                        tgt = np.divide(
                            c1 + 1.0, c1, out=np.zeros_like(c1), where=c1 > 0
                        )
                        tgt = np.where(pos, tgt, 0.0)
                        # weights=w zeroes non-positive rows in both AtA and Atb
                        uids2, AtA, Atb, _ = S.build_normal_equations(
                            ids, X, np.ones_like(r), weights=w, targets=tgt
                        )
                        seg = np.searchsorted(uids, ids)
                        nexpl = np.zeros(g)
                        np.add.at(nexpl, seg, pos.astype(np.float64))
                        # YtY added once per (id, relation) present (:1003,1037-1047)
                        for rj in range(_yty.shape[0]):
                            present = np.zeros(g, dtype=bool)
                            np.logical_or.at(present, seg, rel == rj)
                            AtA[present] += _yty[rj]
                    lam = nexpl * reg  # ALS-WR weighting (:1030,1048-1051)
                    if nonneg:
                        sol = S.solve_nnls(AtA, Atb, lam)
                    else:
                        sol = S.solve_cholesky(AtA, Atb, lam)
                    return pd.DataFrame(
                        {
                            "id": uids.astype(np.int32),
                            "features": list(sol.astype(np.float32)),
                        }
                    )

                # one shuffle: hash ids into this entity's block count
                # (per-entity num_blocks, reference :29-30); every id's
                # rows co-locate, one Arrow batch solves a whole block
                blocks = self._blocks_for(self.entities[e], spark)
                new_factors = (
                    allc.groupBy(F.pmod(F.hash("id"), F.lit(blocks)).alias("_blk"))
                    .applyInPandas(lambda key, pdf: solve_block(pdf), _FACTOR_SCHEMA)
                )
                # Lineage truncation per entity update (reference :421-422),
                # upgraded to a reliable checkpoint on the configured
                # interval (see reliable_every above).
                update_step += 1
                if reliable_every and update_step % reliable_every == 0:
                    factors[e] = new_factors.checkpoint(eager=True)
                else:
                    factors[e] = new_factors.localCheckpoint(eager=True)

        for _, _, df in cached:
            df.unpersist()  # quirk Q5 fixed: reference never unpersists

        named = {self.entities[e]: factors[e] for e in range(n_ent)}
        return CollectiveALSModel(self.rank, self.entities, named, self.prediction_col)

    # ----------------------------------------------------------- helpers
    def _initialize(self, ids: DataFrame, entity_index: int) -> DataFrame:
        rank, seed = self.rank, self.seed

        def gen(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                idv = pdf["id"].values.astype(np.int64)
                feats = S.init_factors_for_ids(idv, rank, seed, entity_index)
                yield pd.DataFrame(
                    {"id": idv.astype(np.int32), "features": list(feats)}
                )

        return ids.mapInPandas(gen, _FACTOR_SCHEMA)

    @staticmethod
    def _compute_yty(factors: DataFrame) -> np.ndarray:
        """Gramian of a factor table: partial per Arrow batch, summed on
        the driver (k×k is tiny) — reference ``computeYtY`` (:1058-1065)."""

        def gram(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["features"].values).astype(np.float64)
                yield pd.DataFrame({"g": [S.compute_yty(X).ravel().tolist()]})

        schema = T.StructType(
            [T.StructField("g", T.ArrayType(T.DoubleType(), False), False)]
        )
        parts = factors.select("features").mapInPandas(gram, schema).collect()
        if not parts:
            raise ValueError("empty factor table")
        k = int(math.isqrt(len(parts[0].g)))
        return np.sum([np.array(p.g).reshape(k, k) for p in parts], axis=0)
