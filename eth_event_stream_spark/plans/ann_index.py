"""Persisted ANN index: the incremental ingest cycle for the vector lane.

The production problem, mirrored from ``plans/incremental.py``'s dedup
cycle: the corpus's embeddings are petabytes and already indexed; every
ingest cycle brings a small new batch, and every serving query wants
top-k neighbors NOW. Rebuilding the IVF index (Lloyd rounds over the full
corpus) per cycle or per query re-pays the full corpus cost. The
persisted shape pays it once:

- ``persist_ann_index``: run the Lloyd build once, then write (a) the
  K-row centroid table and (b) the CELL-PARTITIONED vector store —
  ``partitionBy("cell")`` parquet, so each IVF cell is its own directory.
  That physical layout is the index: a probe that touches N_PROBE of
  K cells reads N_PROBE directories and never lists the rest (parquet
  partition pruning, asserted in tests/test_ann_index.py).
- ``ann_append_batch``: assign ONLY the new batch against the persisted
  centroids (broadcast K rows, O(batch)) and append into the partitioned
  store — the index absorbs an ingest cycle without touching corpus
  vectors. Centroids drift as data drifts; the rebuild criterion
  (re-run ``persist_ann_index`` when cell occupancy skews) is the same
  "once per release" cadence as the dedup artifacts.
- ``ann_probe_topk``: nearest N_PROBE cells for the query via the K-row
  centroid table (a 2-row driver decision — bounded metadata, same
  pattern as the pinned thresholds), then an exact-cosine TakeOrdered
  over ONLY those cells' files.
- ``load_ann_index`` refuses parameter or schema drift between the
  writer and the reader, exactly like the dedup artifact loader.

The composed, driver-oracled twin of this cycle is
``similarity_topk_ivf`` (same centroids, same assignment, same probe
arithmetic — parity pinned in tests); these functions are the
between-query state it amortizes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .vectors import (
    K_CELLS,
    EMB_DIM,
    LLOYD_ROUNDS,
    N_PROBE,
    cell_assignments,
    cosine_to_qe,
    ivf_build_centroids,
    probe_cells,
)

_META = "ann_meta.json"
_CENTROIDS = "centroids.parquet"
_CELL_STORE = "cell_store.parquet"

# dtypes after reading back the partitioned store (cell is the partition
# column; Spark reads it back as int)
_STORE_SCHEMA = {
    "vec_id": "bigint",
    "label": "int",
    "embedding": "array<float>",
    "cell": "int",
}
_CENT_SCHEMA = {"cid": "bigint", "ce": "array<double>"}


def _ann_meta() -> dict:
    return {
        "k_cells": K_CELLS,
        "emb_dim": EMB_DIM,
        "n_probe": N_PROBE,
        "lloyd_rounds": LLOYD_ROUNDS,
    }


def persist_ann_index(
    spark: SparkSession, sf_dir: str, out_dir: str, e: DataFrame | None = None
) -> None:
    """Build once, persist: Lloyd-refined centroids + the cell-partitioned
    vector store. This function is the timed ``ann_build`` bench row."""
    if e is None:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = ivf_build_centroids(spark, sf_dir, e=e).localCheckpoint(eager=True)
    cells = cell_assignments(e, cent)
    store = e.join(cells, "vec_id").select("vec_id", "label", "embedding", "cell")
    store.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(out_dir, _CELL_STORE)
    )
    cent.write.mode("overwrite").parquet(os.path.join(out_dir, _CENTROIDS))
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(_ann_meta(), f)


def load_ann_index(spark: SparkSession, idx_dir: str) -> dict[str, DataFrame]:
    """Reload a persisted index, refusing parameter/schema drift — a
    K_CELLS or dimension change between writer and reader probes garbage
    silently otherwise."""
    with open(os.path.join(idx_dir, _META)) as f:
        meta = json.load(f)
    want = _ann_meta()
    if meta != want:
        raise ValueError(
            f"ANN index at {idx_dir} was built under {meta}, but this build "
            f"expects {want} — rebuild the index (a cell-count/dimension/"
            "probe-width change invalidates the persisted layout)"
        )
    out: dict[str, DataFrame] = {}
    for name, schema in (("centroids", _CENT_SCHEMA), ("cell_store", _STORE_SCHEMA)):
        df = spark.read.parquet(
            os.path.join(idx_dir, _CENTROIDS if name == "centroids" else _CELL_STORE)
        )
        if dict(df.dtypes) != schema:
            raise ValueError(
                f"ANN artifact {name} at {idx_dir} has schema "
                f"{sorted(df.dtypes)}, expected {sorted(schema.items())} — "
                "schema drift between cycles"
            )
        out[name] = df
    return out


def ann_append_batch(
    spark: SparkSession, idx_dir: str, new_vecs: DataFrame
) -> None:
    """Ingest a new embedding batch into the persisted index: assign
    against the FROZEN centroids (broadcast K rows — O(batch), the corpus
    store is not read, not shuffled, not rewritten) and append into the
    cell partitions. Idempotence is the caller's offset contract (the
    streaming source's exactly-once batches), same as every parquet
    append sink."""
    idx = load_ann_index(spark, idx_dir)
    cells = cell_assignments(new_vecs, idx["centroids"])
    (
        new_vecs.join(cells, "vec_id")
        .select("vec_id", "label", "embedding", "cell")
        .write.partitionBy("cell")
        .mode("append")
        .parquet(os.path.join(idx_dir, _CELL_STORE))
    )


def ann_probe_topk(
    spark: SparkSession,
    idx_dir_or_index,
    query_vec: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Serve one query from the persisted index: N_PROBE nearest cells
    from the K-row centroid table (collected — an N_PROBE-row driver
    decision that becomes a LITERAL partition filter, so the parquet scan
    lists only those cell directories), exact cosine over the probed
    cells, TakeOrdered top-k. ``query_vec`` is a 1-row frame with column
    ``embedding``."""
    idx = (
        idx_dir_or_index
        if isinstance(idx_dir_or_index, dict)
        else load_ann_index(spark, idx_dir_or_index)
    )
    cells = [
        r["cell"] for r in probe_cells(query_vec, idx["centroids"]).collect()
    ]
    q = query_vec.select(F.col("embedding").alias("qe"))
    return (
        idx["cell_store"]
        .filter(F.col("cell").isin(cells) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.col("cell").cast("bigint").alias("cell"),
            cosine_to_qe().alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


class AnnIndexManager:
    """Zero-downtime lifecycle for the persisted ANN index: versioned
    build → append → health-check → rebuild rotation.

    ``persist_ann_index`` freezes the centroids at build time; appends
    assign against the frozen table, so as the corpus drifts the cell
    occupancy skews and probe cost/recall degrade. The docstring contract
    above ("re-run the build when cell occupancy skews") becomes code here:

    - ``health`` measures per-cell occupancy from the live store (a
      partition-column-only aggregate — the vectors are never read);
      ``needs_rebuild`` reduces it to the one-number skew criterion
      (max cell share / ideal share).
    - ``rebuild`` re-runs the Lloyd build over the CURRENT store contents
      into a NEW version directory and swaps an atomic ``CURRENT`` pointer
      (``os.replace``) — the copy-on-write rotation of
      ``warehouse._VersionedTable``: readers holding the old pointer keep
      probing the superseded version (``retain`` ≥ 1 keeps it on disk),
      a crash mid-rebuild leaves the old pointer live, and a re-run is a
      no-op rotation. Lloyd is deterministic in the vector SET, so a
      rebuild is bit-identical to a fresh build over the same corpus
      (pinned in tests/test_ann_index.py).
    """

    _POINTER = "CURRENT"

    def __init__(self, root: str, retain: int = 1):
        self.root = root
        self.retain = max(1, retain)

    # -- pointer plumbing (the _VersionedTable pattern) ----------------
    def _read_pointer(self) -> str | None:
        p = os.path.join(self.root, self._POINTER)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def current_dir(self) -> str:
        v = self._read_pointer()
        if v is None:
            raise FileNotFoundError(f"no ANN index published yet at {self.root}")
        return os.path.join(self.root, v)

    def versions(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(e for e in os.listdir(self.root) if e.startswith("v-"))

    def _next_version(self) -> str:
        """Monotonic version id: one past the highest ever published.

        Derived from the max existing ``v-NNNNNN`` (not the directory entry
        COUNT): after GC prunes superseded versions the count shrinks, and a
        count-derived name would collide with — and overwrite in place — the
        LIVE version CURRENT points at, breaking the zero-downtime and
        crash-safety contracts. Max+1 can never name an existing directory.
        """
        highest = -1
        for entry in os.listdir(self.root):
            if entry.startswith("v-"):
                try:
                    highest = max(highest, int(entry[2:]))
                except ValueError:
                    continue
        return f"v-{highest + 1:06d}"

    def _publish(self, build_fn) -> str:
        """Build into a fresh version dir, then atomically repoint."""
        import shutil

        os.makedirs(self.root, exist_ok=True)
        version = self._next_version()
        vdir = os.path.join(self.root, version)
        if os.path.exists(vdir):  # defence in depth: never mutate a published dir
            raise FileExistsError(f"refusing to build into existing version {vdir}")
        try:
            build_fn(vdir)
        except BaseException:
            # A failed build must not leave a partial v-NNNNNN behind: with
            # monotonic naming it is never reused, so the next successful
            # publish's GC (keep = last `retain` superseded entries,
            # lexicographic) would RETAIN the garbage partial dir while
            # deleting the genuinely superseded previous version that
            # old-pointer readers may still be probing.
            shutil.rmtree(vdir, ignore_errors=True)
            raise
        tmp = os.path.join(self.root, self._POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(self.root, self._POINTER))
        keep = {version, self._POINTER}
        superseded = sorted(e for e in os.listdir(self.root) if e not in keep)
        keep.update(superseded[-self.retain:])
        for entry in os.listdir(self.root):
            if entry not in keep:
                shutil.rmtree(os.path.join(self.root, entry), ignore_errors=True)
        return vdir

    # -- lifecycle ------------------------------------------------------
    def build(self, spark: SparkSession, sf_dir: str, e: DataFrame | None = None) -> str:
        return self._publish(
            lambda vdir: persist_ann_index(spark, sf_dir, vdir, e=e)
        )

    _APPLIED = "_APPLIED_BATCHES"

    def append(
        self, spark: SparkSession, new_vecs: DataFrame, batch_id: int | None = None
    ) -> None:
        """Ingest a batch into the LIVE version's cell store. With a
        ``batch_id`` (the foreachBatch epoch), the append is EXACTLY-ONCE —
        the sink contract of the reference (`sink.rs:13-21`) extended to
        the mutating ingest lane, where the versioned pointer cannot help
        (appends don't rotate versions):

        1. replayed ids no-op (recorded in the version's ``_APPLIED_BATCHES``
           file AFTER the batch's files are all in place);
        2. every file the batch contributes carries a deterministic
           ``batch-<id>-`` prefix, so a replay of a CRASHED attempt first
           scrubs the leftovers, then re-stages — the mid-move and
           post-move-pre-record crash windows both resolve to exactly-once;
        3. the batch is staged by one Spark job into a ``_staging`` dir and
           moved file-by-file (same-FS ``os.replace``, with Hadoop's .crc
           sidecars) — readers never see a half-visible batch of a name
           they could double-count.

        Without ``batch_id`` the raw ``ann_append_batch`` applies and
        idempotence is the caller's offset contract."""
        vdir = self.current_dir()
        if batch_id is None:
            ann_append_batch(spark, vdir, new_vecs)
            return
        import glob
        import shutil

        applied_path = os.path.join(vdir, self._APPLIED)
        applied: set[int] = set()
        if os.path.exists(applied_path):
            with open(applied_path) as f:
                applied = {int(x) for x in f.read().split()}
        if batch_id in applied:
            return  # epoch replay: already folded in
        store = os.path.join(vdir, _CELL_STORE)
        prefix = f"batch-{batch_id:09d}-"
        # scrub a crashed attempt's leftovers (files + .crc sidecars)
        for path in glob.glob(os.path.join(store, "cell=*", f"{prefix}*")) + glob.glob(
            os.path.join(store, "cell=*", f".{prefix}*.crc")
        ):
            os.remove(path)
        staging = os.path.join(vdir, f"_staging_batch_{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        idx = load_ann_index(spark, vdir)
        cells = cell_assignments(new_vecs, idx["centroids"])
        (
            new_vecs.join(cells, "vec_id")
            .select("vec_id", "label", "embedding", "cell")
            .write.partitionBy("cell")
            .parquet(staging)
        )
        for src in glob.glob(os.path.join(staging, "cell=*", "*.parquet")):
            cell_dir = os.path.join(store, os.path.basename(os.path.dirname(src)))
            os.makedirs(cell_dir, exist_ok=True)
            name = prefix + os.path.basename(src)
            crc = os.path.join(
                os.path.dirname(src), "." + os.path.basename(src) + ".crc"
            )
            if os.path.exists(crc):
                os.replace(crc, os.path.join(cell_dir, "." + name + ".crc"))
            os.replace(src, os.path.join(cell_dir, name))
        shutil.rmtree(staging, ignore_errors=True)
        tmp = applied_path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(str(i) for i in sorted(applied | {batch_id})))
        os.replace(tmp, applied_path)
        # files changed under a path Spark may have listed — drop the cache
        spark.catalog.refreshByPath(store)

    def probe(self, spark: SparkSession, query_vec: DataFrame, k: int = 10) -> DataFrame:
        return ann_probe_topk(spark, self.current_dir(), query_vec, k=k)

    def health(self, spark: SparkSession) -> DataFrame:
        """(cell, n, share_ppm): occupancy of every live cell. Reads ONLY
        the partition column — a count over the store groups by the
        directory key, no vector bytes move."""
        store = load_ann_index(spark, self.current_dir())["cell_store"]
        counts = store.groupBy("cell").agg(F.count("*").alias("n"))
        total = counts.agg(F.sum("n").alias("total"))
        return counts.crossJoin(F.broadcast(total)).select(
            "cell",
            "n",
            (F.col("n") * 1000000 / F.col("total")).cast("bigint").alias("share_ppm"),
        )

    def needs_rebuild(self, spark: SparkSession, max_skew: float = 4.0) -> bool:
        """True when the fullest cell holds more than ``max_skew`` times its
        ideal 1/K share — the one-number drift criterion. A 2-row driver
        decision (max over K cells), same bounded-metadata pattern as the
        probe's cell pick."""
        h = self.health(spark)
        row = h.agg(F.max("share_ppm").alias("mx")).collect()[0]
        ideal_ppm = 1000000 / K_CELLS
        return row["mx"] is not None and row["mx"] > max_skew * ideal_ppm

    def _scrub_unapplied_batch_files(self, spark: SparkSession, vdir: str) -> int:
        """Remove ``batch-<id>-`` prefixed cell files whose id is NOT in
        ``_APPLIED_BATCHES`` — the debris of an append that crashed
        mid-move. Normally the epoch's replay scrubs them itself, but a
        ``rebuild()`` that runs FIRST would bake the partial batch
        untagged into the rebuilt corpus while the carried-forward record
        still lacks the id: the later replay then finds no prefixed files
        to scrub and re-appends the full batch, duplicating the
        partially-moved vectors. Returns the number of files removed."""
        import glob
        import re

        applied_path = os.path.join(vdir, self._APPLIED)
        applied: set[int] = set()
        if os.path.exists(applied_path):
            with open(applied_path) as f:
                applied = {int(x) for x in f.read().split()}
        store = os.path.join(vdir, _CELL_STORE)
        pat = re.compile(r"^\.?batch-(\d+)-")
        removed = 0
        for path in glob.glob(os.path.join(store, "cell=*", "batch-*")) + glob.glob(
            os.path.join(store, "cell=*", ".batch-*.crc")
        ):
            m = pat.match(os.path.basename(path))
            if m and int(m.group(1)) not in applied:
                os.remove(path)
                removed += 1
        if removed:
            spark.catalog.refreshByPath(store)
        return removed

    def rebuild(self, spark: SparkSession) -> str:
        """Re-run the Lloyd build over the live store's CURRENT contents
        (base + every appended batch) into a new version; zero-downtime
        pointer swap. O(corpus) — paid once per drift episode, not per
        ingest batch.

        The applied-batch record CARRIES FORWARD into the new version:
        the rebuilt store already CONTAINS every applied epoch's vectors,
        so a replay of one of those epochs after the rotation (crash
        between rebuild and the source's commit) must still no-op — a
        fresh ``_APPLIED_BATCHES`` would double-ingest it. Conversely, an
        UNAPPLIED crashed append's partial files are scrubbed BEFORE the
        store is read, so the rebuilt corpus never bakes in vectors whose
        epoch the record doesn't cover (the replay re-stages the whole
        batch from source afterwards — exactly-once either way)."""
        import shutil

        old_vdir = self.current_dir()
        self._scrub_unapplied_batch_files(spark, old_vdir)
        vecs = (
            load_ann_index(spark, old_vdir)["cell_store"]
            .select("vec_id", "label", "embedding")
            .localCheckpoint(eager=True)  # sever lineage from the dir being rotated
        )
        applied = os.path.join(old_vdir, self._APPLIED)

        def build_with_applied(vdir):
            persist_ann_index(spark, "", vdir, e=vecs)
            if os.path.exists(applied):
                shutil.copyfile(applied, os.path.join(vdir, self._APPLIED))

        return self._publish(build_with_applied)
