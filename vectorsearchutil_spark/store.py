"""VectorStore — reference-API-parity facade over a DataFrame store.

Reproduces ``vsu.base.VectorSearchBase``'s surface
(``set_data / query / query_with_info / set_zeroshot_labels /
do_zeroshot / MLP_Classifier / MLP_Regressor / reset_db``,
``vsu/base/VectorSearchBase.py:96-256``) with Spark semantics:

* the store is one DataFrame (optionally Parquet-persisted) — the
  reference's SQLite ``data`` table, ``vss`` index and pandas mirror
  collapse into it (the vector column IS the index payload; exact kNN
  subsumes ANN on correctness);
* ingest is one distributed job instead of a per-row transaction
  loop; first-wins dedup on ``target`` matches
  ``VectorSearchBase.py:79-87,124``;
* ids are assigned by ``row_number`` over ingest order (the
  reference's ``last_insert_rowid`` monotonic ids, :89).

Persistence modes:

* ``path=`` — plain Parquet; append rewrites via a staged copy and
  the anti-join broadcasts the existing targets (fine for small
  local stores).
* ``table=`` — **bucketed managed table** (bucketBy hash(target)):
  the 100 TB posture. Append writes ONLY the fresh rows
  (``mode("append")`` into the bucketed table — no store rewrite,
  no staging copy), and the insert-if-absent anti-join reads the
  store bucket-aligned: the Exchange lands on the small incoming
  batch, never on the store.
* ``acid_path=`` — **manifest-log table** (sources/manifest.py): the
  object-store-safe ACID mode. Immutable data directories + an
  atomic create-exclusive version manifest per commit (the
  conditional-PUT primitive S3/GCS/ABFS provide); appends commit
  only the appended rows; crashes at any point leave the previous
  version readable and the half-written transaction invisible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vectorsearchutil_spark.embedders import embed_udf, embedding_dim
from vectorsearchutil_spark.operators.knn import knn

#: Fixed logical schema (reference save_columns, VectorSearchBase.py:21)
SAVE_COLUMNS = ["target", "option1", "option2", "option3", "option4", "option5"]

STORE_SCHEMA = StructType(
    [StructField("id", LongType())]
    + [StructField(c, StringType()) for c in SAVE_COLUMNS]
    + [StructField("vector", ArrayType(FloatType()))]
)


class VectorStore:
    """Spark-native replacement for ``VectorSearchBase`` subclasses.

    ``embedder`` picks a registered encoder (default: the
    deterministic ``hash64`` stub) instead of subclassing
    (``vsu/text/_classes.py``, ``vsu/image/_classes.py``).
    """

    #: dedup-state table names (see ingest_dedup_check)
    _DEDUP_PARTS = ("meta", "shingles", "buckets")

    def __init__(
        self,
        spark: SparkSession,
        embedder: str = "hash64",
        path: str | None = None,
        table: str | None = None,
        acid_path: str | None = None,
        acid_format: str = "manifest",
        num_buckets: int = 16,
        maintain_dedup_state: bool = False,
        dedup_params: dict | None = None,
    ):
        if sum(x is not None for x in (path, table, acid_path)) > 1:
            raise ValueError(
                "pass at most one of path= / table= / acid_path="
            )
        self.spark = spark
        self.embedder = embedder
        self.vec_size = embedding_dim(embedder)
        self.path = path
        self.table = table
        self.num_buckets = num_buckets
        self._df: DataFrame | None = None
        self.zeroshot_labels: list[str] = []
        self._labels_df: DataFrame | None = None
        #: persisted ingest-dedup signatures (VERDICT r2 #5): built
        #: per batch at ingest, appended — never recomputed for rows
        #: already in the store
        self.maintain_dedup_state = maintain_dedup_state
        self.dedup_params = {
            "n": 3, "num_hashes": 16, "band_size": 4,
            **(dedup_params or {}),
        }
        self._dedup_state: dict[str, DataFrame] | None = None
        #: acid_path= — manifest-log table (sources/manifest.py): the
        #: object-store-safe mode. Appends commit only the appended
        #: rows; every commit is an atomic create-exclusive manifest
        #: write (conditional-PUT analog), no directory renames.
        self.acid = None
        if acid_path is not None:
            if acid_format == "delta":
                # production table format, import-guarded — raises a
                # clear ImportError where delta-spark is absent
                from vectorsearchutil_spark.sources.deltalog import (
                    DeltaLog,
                )

                self.acid = DeltaLog(acid_path)
            else:
                from vectorsearchutil_spark.sources.manifest import (
                    ManifestLog,
                )

                self.acid = ManifestLog(acid_path)
            self._df = self.acid.read(spark)
            if maintain_dedup_state:
                try:
                    self._dedup_state = {
                        part: spark.read.parquet(self._dedup_dir(part))
                        for part in self._DEDUP_PARTS
                    }
                except Exception:
                    self._dedup_state = None
        if path is not None:
            self._recover_path(path)
            try:
                self._df = spark.read.parquet(path)
            except Exception:
                self._df = None
            if maintain_dedup_state:
                try:
                    self._dedup_state = {
                        part: spark.read.parquet(self._dedup_dir(part))
                        for part in self._DEDUP_PARTS
                    }
                except Exception:
                    self._dedup_state = None
        elif table is not None and spark.catalog.tableExists(table):
            self._df = spark.table(table)
            if maintain_dedup_state and spark.catalog.tableExists(
                f"{table}_dedup_meta"
            ):
                self._dedup_state = {
                    part: spark.table(f"{table}_dedup_{part}")
                    for part in self._DEDUP_PARTS
                }

    def _dedup_dir(self, part: str) -> str:
        base = self.path if self.path is not None else self.acid.base
        return base.rstrip("/") + "__dedup/" + part

    @staticmethod
    def _recover_path(path: str) -> None:
        """Heal a store interrupted mid-swap (see _persist).

        The swap order guarantees at least one complete copy exists at
        every crash point: live dir, ``__old`` (previous version), or
        ``__staging`` with a ``_SUCCESS`` marker (new version).
        """
        import os
        import shutil

        base = path.rstrip("/")
        staging, old = base + "__staging", base + "__old"
        if os.path.exists(base):
            # swap completed (or never started) — drop leftovers
            shutil.rmtree(staging, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            return
        if os.path.exists(os.path.join(staging, "_SUCCESS")):
            os.rename(staging, base)  # new version fully written
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.exists(old):
            os.rename(old, base)  # roll back to previous version
            shutil.rmtree(staging, ignore_errors=True)

    # -- store state -------------------------------------------------

    @property
    def data(self) -> DataFrame:
        """The queryable store (reference mirror, VectorSearchBase.py:64-72)."""
        if self._df is None:
            return self.spark.createDataFrame([], STORE_SCHEMA)
        return self._df

    def count(self) -> int:
        return self.data.count()

    def reset_db(self) -> None:
        """Drop everything (reference reset_db, VectorSearchBase.py:96-99)."""
        import shutil

        self._df = None
        self._dedup_state = None
        if self.table is not None:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
            for part in self._DEDUP_PARTS:
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {self.table}_dedup_{part}"
                )
        if self.path is not None:
            shutil.rmtree(
                self.path.rstrip("/") + "__dedup", ignore_errors=True
            )
        if self.acid is not None:
            self.acid.drop()
            shutil.rmtree(
                self.acid.base + "__dedup", ignore_errors=True
            )

    def _persist(self, df: DataFrame) -> DataFrame:
        if self.acid is not None:
            # full-replace commit (appends go through the dedicated
            # append commit in set_data, which writes only fresh rows)
            self.acid.write_and_commit(df, mode="replace")
            return self.acid.read(self.spark)
        if self.table is not None:
            (
                df.write.mode("overwrite")
                .bucketBy(self.num_buckets, "target")
                .sortBy("target")
                .saveAsTable(self.table)
            )
            return self.spark.table(self.table)
        if self.path is not None:
            # the append path unions the DataFrame being overwritten;
            # Spark reads lazily DURING the overwrite and would clobber
            # its own input. Write the new version ONCE to a staging
            # dir, verify it, then swap it into place with renames —
            # the previous version survives on disk until the swap
            # completes, so no crash point loses the store, and each
            # append writes the data exactly once instead of twice.
            # (Local-FS rename; with Delta/Iceberg this would be a
            # single ACID MERGE/append — the bucketed table= mode is
            # the cluster-scale posture.)
            import os
            import shutil

            base = self.path.rstrip("/")
            staging = base + "__staging"
            df.write.mode("overwrite").parquet(staging)
            # verify the staged write is readable before touching live
            self.spark.read.parquet(staging).count()
            old = base + "__old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(base):
                os.rename(base, old)
            os.rename(staging, base)
            shutil.rmtree(old, ignore_errors=True)
            return self.spark.read.parquet(base)
        return df.cache()

    def compact(self, target_files: int = 1) -> None:
        """Rewrite the path-mode store into ``target_files`` files.

        Streaming/micro-batch appends accumulate small files (each
        append rewrites, but a long-lived store fed by many tiny
        batches still fragments); at scale small files dominate scan
        planning cost. Uses the same staged atomic swap as appends,
        so a crash mid-compaction never loses the store. No-op for
        table mode (bucketed layout fixes file count by bucket) and
        for empty stores.
        """
        if self._df is None:
            return
        if self.acid is not None:
            self.acid.compact(self.spark, target_files)
            self.acid.vacuum()
            self._df = self.acid.read(self.spark)
            return
        if self.path is None:
            return
        self._df = self._persist(self.data.coalesce(target_files))

    # -- ingest-dedup state (VERDICT r2 #5) ---------------------------

    def _update_dedup_state(self, batch: DataFrame, replace: bool) -> None:
        """Persist the dedup signatures for ``batch`` (rows just
        ingested, read back from the persisted store so lineage is
        clean). Append mode appends ONLY the batch's state rows — the
        incremental property: signature work per append is O(batch),
        never O(store)."""
        from vectorsearchutil_spark.operators.dedup import (
            build_ingest_dedup_state,
        )

        state = build_ingest_dedup_state(
            batch.select("id", "target"),
            text_col="target",
            id_col="id",
            **self.dedup_params,
        )
        mode = "overwrite" if replace else "append"
        if self.path is not None or self.acid is not None:
            for part in self._DEDUP_PARTS:
                state[part].write.mode(mode).parquet(self._dedup_dir(part))
            self._dedup_state = {
                part: self.spark.read.parquet(self._dedup_dir(part))
                for part in self._DEDUP_PARTS
            }
        elif self.table is not None:
            for part in self._DEDUP_PARTS:
                state[part].write.mode(mode).saveAsTable(
                    f"{self.table}_dedup_{part}"
                )
            self._dedup_state = {
                part: self.spark.table(f"{self.table}_dedup_{part}")
                for part in self._DEDUP_PARTS
            }
        else:
            if replace or self._dedup_state is None:
                self._dedup_state = {
                    p: state[p].cache() for p in self._DEDUP_PARTS
                }
            else:
                self._dedup_state = {
                    p: self._dedup_state[p].unionByName(state[p]).cache()
                    for p in self._DEDUP_PARTS
                }

    def ingest_dedup_check(
        self,
        incoming: DataFrame,
        threshold: float = 0.8,
        text_col: str = "target",
        id_col: str = "id",
    ) -> DataFrame:
        """Gate a candidate batch against the store BEFORE ingesting:
        per row, 'exact_dup' / 'near_dup' (MinHash-LSH at Jaccard ≥
        threshold) / 'new' + the lowest matching store id.

        With ``maintain_dedup_state`` the store side contributes only
        its persisted signature tables — the append-time cost is one
        signature pass over the batch plus batch-driven broadcast
        joins; the store is never re-shingled (production posture).
        Without state it falls back to deriving the store side in-job
        (identical results)."""
        from vectorsearchutil_spark.operators.dedup import (
            build_ingest_dedup_state,
            incremental_ingest_dedup_with_state,
        )

        inc = incoming
        if text_col != "target" or id_col != "id":
            inc = incoming.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("target")
            )
        state = self._dedup_state
        if state is None:
            state = build_ingest_dedup_state(
                self.data.select("id", "target"),
                text_col="target",
                id_col="id",
                **self.dedup_params,
            )
        return incremental_ingest_dedup_with_state(
            state,
            inc,
            text_col="target",
            id_col="id",
            threshold=threshold,
            **self.dedup_params,
        )

    # -- ingest (A1/A2) ------------------------------------------------

    def set_data(self, data: DataFrame, append: bool = False) -> None:
        """Replace-or-append ingest (reference set_data,
        VectorSearchBase.py:101-133).

        Semantics pinned to the reference: requires ``target``
        (silent no-op otherwise, :104-105); computes ``vector`` when
        missing; null-fills absent option columns (:119-121); projects
        extra columns away (:124-126); dedup on ``target`` is
        first-wins in ingest order (:124) and append never overwrites
        existing targets (:79-87).
        """
        if "target" not in data.columns:
            return
        # ingest-order marker: monotonically_increasing_id is
        # monotone in (partition, position), preserving input order of
        # a driver-created DataFrame — the analog of pandas row order.
        df = data.withColumn("_ord", F.monotonically_increasing_id())
        if "vector" not in df.columns:
            df = df.withColumn("vector", embed_udf(self.embedder)(F.col("target")))
        for c in SAVE_COLUMNS:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        df = df.select(*SAVE_COLUMNS, "vector", "_ord")
        # first-wins dedup within the batch
        win = Window.partitionBy("target").orderBy("_ord")
        df = (
            df.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if append and self._df is not None:
            existing = self.data
            # insert-if-absent: left anti vs existing targets
            # (reference insert_data guard, VectorSearchBase.py:79-87)
            if self.table is not None:
                # bucketed mode: no broadcast hint — the store scan is
                # already hash-partitioned by target, so the anti-join
                # shuffles only the incoming batch
                fresh = df.join(existing.select("target"), "target", "left_anti")
            else:
                # no broadcast hint: the existing store is unbounded;
                # AQE demotes to broadcast when it measures small
                fresh = df.join(existing.select("target"), "target", "left_anti")
            start = existing.agg(F.coalesce(F.max("id"), F.lit(0))).first()[0]
            fresh = fresh.withColumn(
                "id", F.row_number().over(Window.orderBy("_ord")) + F.lit(start)
            ).select("id", *SAVE_COLUMNS, "vector")
            if self.table is not None:
                # incremental append: write ONLY the fresh rows into
                # the bucketed table — at 100 TB the store is never
                # rewritten, and there is no staging double-write
                (
                    fresh.write.mode("append")
                    .bucketBy(self.num_buckets, "target")
                    .sortBy("target")
                    .saveAsTable(self.table)
                )
                self._df = self.spark.table(self.table)
            elif self.acid is not None:
                # ACID append: one immutable data directory holding
                # ONLY the fresh rows + one atomic manifest commit —
                # the store is never rewritten and a crash at any
                # point leaves the previous version fully readable
                self.acid.write_and_commit(fresh, mode="append")
                self._df = self.acid.read(self.spark)
            else:
                self._df = self._persist(existing.unionByName(fresh))
            if self.maintain_dedup_state:
                # signatures for the APPENDED rows only (read back from
                # the persisted store: clean lineage, and ids > start
                # are exactly this batch) — O(batch) state work
                self._update_dedup_state(
                    self.data.filter(F.col("id") > F.lit(start)),
                    replace=False,
                )
        else:
            df = df.withColumn("id", F.row_number().over(Window.orderBy("_ord")))
            self._df = self._persist(df.select("id", *SAVE_COLUMNS, "vector"))
            if self.maintain_dedup_state:
                self._update_dedup_state(self.data, replace=True)

    # -- queries (A5/A6/A7) -------------------------------------------

    def query(self, q: str | Sequence[float], k: int = 5) -> DataFrame | None:
        """kNN by text (embedded) or by raw vector.

        Returns None on an empty store (reference guard,
        VectorSearchBase.py:209-210). Result: id, save_columns,
        distance — ascending L2, ties by id.
        """
        if self._df is None or self.data.rdd.isEmpty():
            return None
        if isinstance(q, str):
            qdf = self.spark.createDataFrame([(q,)], ["target"])
            qvec = qdf.select(
                embed_udf(self.embedder)(F.col("target")).alias("v")
            ).first()[0]
        else:
            qvec = [float(x) for x in q]
        out = knn(self.data, qvec, k=k, vector_col="vector", id_col="id")
        return out.select("id", *SAVE_COLUMNS, "distance")

    def query_with_info(self, q: str | Sequence[float], k: int = 5) -> DataFrame | None:
        """A7: like query() but drops all-null columns
        (VectorSearchBase.py:215-217). Data-dependent projection —
        one aggregate pass over the k-row result, then a select."""
        res = self.query(q, k)
        if res is None:
            return None
        from vectorsearchutil_spark.operators.projection import (
            prune_all_null_columns,
        )

        return prune_all_null_columns(res)

    # -- ANN index (reference vss/faiss analog at scale) ---------------

    def build_ann_index(
        self, n_lists: int = 8, index_path: str | None = None
    ) -> None:
        """Materialize an IVF index over the store's vectors — the
        scale analog of the reference's faiss-backed ``vss`` table
        (vsu/base/VectorSearchBase.py:54-59). Exact kNN (``query``)
        subsumes ANN on correctness; this is the sublinear-read path.

        k-means centroids (size-gated driver/distributed strategy)
        define the coarse lists; the corpus is written PARTITIONED BY
        list id, so a probe-limited search is partition pruning — at
        100 TB each query reads n_probe/n_lists of the index. The
        centroid table (k rows) persists next to it. Rebuild after
        large appends (same posture as faiss retraining)."""
        import os

        from vectorsearchutil_spark.operators.clustering import kmeans
        from vectorsearchutil_spark.operators.similarity import (
            build_ivf_index,
        )

        if self._df is None:
            return
        if index_path is None:
            base = (
                self.path if self.path is not None
                else self.acid.base if self.acid is not None
                else None
            )
            if base is None:
                raise ValueError(
                    "index_path= required for cache-mode stores"
                )
            index_path = base.rstrip("/") + "__ivf"
        # one sizing count feeds BOTH gates (k-means driver/distributed
        # and the assignment's expression/Arrow path — the HOF wall)
        n_rows = self.data.count()
        _, centroids = kmeans(
            self.data, k=n_lists, vector_col="vector", id_col="id",
            n_rows=n_rows,
        )
        cents = centroids.select(
            F.col("cid").alias("centroid_id"),
            F.col("cv").alias("centroid_vec"),
        )
        indexed = build_ivf_index(
            self.data, cents, vector_col="vector", id_col="id",
            n_rows=n_rows,
        )
        indexed.write.mode("overwrite").partitionBy("centroid_id").parquet(
            os.path.join(index_path, "lists")
        )
        cents.write.mode("overwrite").parquet(
            os.path.join(index_path, "centroids")
        )
        self._ivf_path = index_path

    def add_to_ann_index(self, index_path: str | None = None) -> int:
        """Incremental IVF maintenance: assign ONLY the store rows not
        yet in the index to the EXISTING centroids and append them to
        their list partitions — the faiss ``index.add()`` posture
        after ``set_data(append)``, without re-reading or re-writing
        the indexed corpus. Centroids are NOT retrained (quantization
        drifts only if the append distribution does; rebuild with
        :meth:`build_ann_index` then, exactly like faiss re-training).

        The unindexed set derives from a column-pruned id scan of the
        lists (an id-only anti-join, not a vector read); the append
        writes only the new rows, partition-wise. Idempotent: a second
        call appends nothing. Plain-parquet appends are not atomic
        under concurrent writers — use the manifest-log/Delta ACID
        backends for that regime. Returns the number of rows added."""
        import os

        from vectorsearchutil_spark.operators.similarity import (
            build_ivf_index,
        )

        index_path = index_path or getattr(self, "_ivf_path", None)
        if index_path is None or self._df is None:
            return 0
        lists_path = os.path.join(index_path, "lists")
        indexed_ids = self.spark.read.parquet(lists_path).select("id")
        fresh = self.data.join(indexed_ids, "id", "left_anti")
        cents = self.spark.read.parquet(
            os.path.join(index_path, "centroids")
        ).select(
            F.col("centroid_id"), F.col("centroid_vec")
        )
        indexed = build_ivf_index(
            fresh, cents, vector_col="vector", id_col="id",
            n_rows=fresh.count(),
        ).persist()
        n = indexed.count()
        if n:
            indexed.write.mode("append").partitionBy(
                "centroid_id"
            ).parquet(lists_path)
        indexed.unpersist()
        self._ivf_path = index_path
        return n

    def optimize_ann_index(
        self,
        index_path: str | None = None,
        target_files_per_list: int = 1,
    ) -> int:
        """Compact the IVF lists after incremental appends — every
        :meth:`add_to_ann_index` call lands one parquet file per
        touched partition, and small files are THE operational tax of
        incremental ingestion (footer reads and task scheduling start
        to dominate the probe scans). Rewrites the lists directory
        coalesced to ``target_files_per_list`` file(s) per centroid
        partition via a staged swap: write to ``lists__compact``,
        then atomically rename over the old directory (the store's
        staged-swap discipline — a crash leaves either the old or the
        new complete directory, never a mix). Returns the number of
        data files after compaction."""
        import glob
        import os
        import shutil

        index_path = index_path or getattr(self, "_ivf_path", None)
        if index_path is None:
            return 0
        lists_path = os.path.join(index_path, "lists")
        staged = lists_path + "__compact"
        shutil.rmtree(staged, ignore_errors=True)
        # repartition BY KEY ONLY: repartition(N, "centroid_id") sets
        # the TOTAL partition count (N=1 funneled the whole rewrite
        # through one task — a scale bottleneck; ADVICE r4 low) and
        # never meant files-per-list anyway. Hash-distributing on
        # centroid_id gives one task per populated list at default
        # parallelism; files per list is controlled with
        # maxRecordsPerFile sized to the LARGEST list (enforced per
        # output file, so it survives AQE coalescing tasks together —
        # a split-key repartition does not), so the parameter does
        # what its name says: the biggest list lands in exactly
        # `target_files_per_list` files, smaller lists in
        # proportionally fewer.
        lists_df = self.spark.read.parquet(lists_path).repartition(
            "centroid_id"
        )
        writer = lists_df.write.mode("overwrite")
        n = max(1, int(target_files_per_list))
        if n > 1:
            biggest = (
                lists_df.groupBy("centroid_id")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
                or 1
            )
            writer = writer.option(
                "maxRecordsPerFile", max(1, -(-int(biggest) // n))
            )
        (
            writer.partitionBy("centroid_id").parquet(staged)
        )
        old = lists_path + "__old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(lists_path, old)
        os.rename(staged, lists_path)
        shutil.rmtree(old, ignore_errors=True)
        return len(
            [
                p
                for p in glob.glob(
                    os.path.join(lists_path, "**", "*.parquet"),
                    recursive=True,
                )
            ]
        )

    def query_ann(
        self,
        q: str | Sequence[float],
        k: int = 5,
        n_probe: int = 2,
        index_path: str | None = None,
    ) -> DataFrame | None:
        """Approximate kNN through the materialized IVF index: pick
        the n_probe nearest lists driver-side (k-row centroid table),
        scan ONLY those partitions (PartitionFilters — test-asserted),
        exact distance + top-k inside them. Same result contract as
        ``query`` (ascending L2, ties by id); recall < 1 by design."""
        import os

        from vectorsearchutil_spark.operators.knn import knn

        index_path = index_path or getattr(self, "_ivf_path", None)
        if index_path is None or self._df is None:
            return None
        if isinstance(q, str):
            qdf = self.spark.createDataFrame([(q,)], ["target"])
            qvec = qdf.select(
                embed_udf(self.embedder)(F.col("target")).alias("v")
            ).first()[0]
        else:
            qvec = [float(x) for x in q]
        cents = self.spark.read.parquet(
            os.path.join(index_path, "centroids")
        ).collect()
        scored = sorted(
            (
                sum((float(a) - float(b)) ** 2 for a, b in zip(qvec, r[1])),
                int(r[0]),
            )
            for r in cents
        )
        probes = [cid for _, cid in scored[:n_probe]]
        lists = self.spark.read.parquet(os.path.join(index_path, "lists"))
        pruned = lists.filter(F.col("centroid_id").isin(probes))
        out = knn(pruned, qvec, k=k, vector_col="vector", id_col="id")
        return out.select("id", *SAVE_COLUMNS, "distance")

    # -- zero-shot (A8/A9/A19) ----------------------------------------

    def set_zeroshot_labels(self, labels: Sequence[str]) -> None:
        """A19: register the label dimension table
        (VectorSearchBase.py:135-139). Labels embed through the
        SUB-modality encoder (reference A4/A13 — CLIP's labels go
        through its text tower, not the image tower)."""
        from vectorsearchutil_spark.embedders import embed_sub_udf

        self.zeroshot_labels = list(labels)
        rows = [(i, lab) for i, lab in enumerate(labels)]
        ldf = self.spark.createDataFrame(rows, ["label_idx", "label"])
        ldf = ldf.withColumn(
            "label_vec", embed_sub_udf(self.embedder)(F.col("label"))
        )
        self._labels_df = ldf.cache()

    def do_zeroshot(self, variant: str = "e5") -> DataFrame | None:
        """A8/A9: classify every stored row against the label set.

        Returns store columns + per-label scores + ``zeroshot_pred``.
        ``variant='e5'`` = cosine×100 (vsu/text/_classes.py:29-44);
        ``variant='clip'`` = softmax(100·cos) (vsu/image/_classes.py:21-36).
        Argmax tie-break = lowest label index (:40/:32).
        """
        from vectorsearchutil_spark.embedders import supports_zeroshot

        if not supports_zeroshot(self.embedder):
            # A10: embedders without a label tower disable zero-shot
            # (vsu/image/_classes.py:69-70)
            return None
        if self._labels_df is None or self._df is None:
            return None
        from vectorsearchutil_spark.operators.zeroshot import zeroshot

        return zeroshot(
            self.data,
            self._labels_df,
            vector_col="vector",
            id_col="id",
            softmax=(variant == "clip"),
        )

    # -- ML ops (A15/A16) ----------------------------------------------

    def MLP_Classifier(self, y_label: str, hidden_layer_sizes=(100,)):
        """A15 (VectorSearchBase.py:219-234): sklearn MLP trained on
        the driver (the store's vectors fit — the reference trains
        in-process too), distributed inference via pandas_udf."""
        from vectorsearchutil_spark.operators.mlops import mlp_classifier

        return mlp_classifier(
            self.data, y_col=y_label, vector_col="vector",
            hidden_layer_sizes=hidden_layer_sizes,
        )

    def MLP_Regressor(self, y_label: str, hidden_layer_sizes=(100,)):
        """A16 (VectorSearchBase.py:236-256)."""
        from vectorsearchutil_spark.operators.mlops import mlp_regressor

        return mlp_regressor(
            self.data, y_col=y_label, vector_col="vector",
            hidden_layer_sizes=hidden_layer_sizes,
        )
