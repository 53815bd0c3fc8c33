"""Structured-Streaming wrapper for the per-image plan (SURVEY §2.10, §3.1).

Reference semantics mapped to Spark:

- T1 (watchdog directory watch -> queue): a file-source stream over the
  landing directory; micro-batches replace the deque.
- T2 (100 ms poll, one image in flight, cache-on-first-file): trigger
  control; ``maxFilesPerTrigger=1`` reproduces one-image-in-flight, larger
  values batch images — strictly better than the reference's serial loop.
  Calibration is built once on the driver and reused across batches
  (the ``CacheCreator`` analog).
- T3 (file-settle guard): Spark's idiom is ATOMIC ARRIVAL — files must be
  written to a temp path and renamed in (every Spark/Parquet writer does
  this), which removes the race the reference's mtime guard papers over.
  An optional belt-and-braces ``settle_seconds`` row filter on
  ``_metadata.file_modification_time`` is provided; note that unlike the
  reference (which re-polls the file later) a filtered row's file has
  already been consumed by the source, so only use it with sources that
  also write atomically.
- T4 (pause/resume/clear-queue/stop, process-existing-only): ``pause()``
  stops the query but keeps the checkpoint; ``resume()`` restarts from it
  (no input is lost or reprocessed — the file-source log is the queue).
  ``clear_queue()`` is the reference UI's "clear queue" button
  (pipeline_queue.py queue.clear()): it snapshots the currently-visible
  landing files into a persisted skip manifest; on resume those files are
  dropped at the source (already-processed files are unaffected — the
  checkpoint never replays them). Backfill = ``Trigger.AvailableNow``
  (drain all currently-visible files, then stop) — exactly "process
  existing images only, auto-stop" (pipeline_queue.py:849-852).
- T5 (csim needs image n-1): reformulated as a join against the pixel
  STORE (partitioned by dataset/seq so the n-1 and first-image reads are
  partition-pruned scans), not a streaming state store. Out-of-order
  arrival degrades gracefully — the window pairs each image with the
  latest earlier seq present — where the reference mis-pairs on gaps
  (pipeline.py:516-523).

Exactly-once: the checkpoint makes the SOURCE exactly-once (each input
file is processed in one batch). The parquet sinks here are append-only,
so a crash mid-batch can duplicate output rows on retry; production
deployments should point the sinks at a transactional table format
(Delta/Iceberg MERGE on image_id) — the plan itself is unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from xrddatapipeline_spark.calib.geometry import ImageControls
from xrddatapipeline_spark.plans.image_pipeline import (
    cosine_similarity_series,
    run_image_plan,
)

#: schema of a landed pixel file (what the TIFF decode emits per image)
PIXEL_SCHEMA = (
    "dataset string, seq int, image_id string, y int, x int, intensity int"
)

OUTPUT_TABLES = ("integrals", "spot_stats", "spottiness", "outliers", "csim")
#: written additionally when the pipeline runs with gradient_stage=True
GRADIENT_TABLES = ("gradient_arcs",)


def _observation_get(o, name: str, timeout_s: float = 60.0):
    """``Observation.get`` with a bounded wait.

    ``get`` blocks indefinitely until some action materializes the observed
    frame. All frames the pipeline observes ARE consumed by the batch
    writes, so this normally returns immediately — the timeout converts a
    misconfigured barrier/observe combination (an observed frame nothing
    materialized) from a silent stream hang into a visible warning.
    """
    import time
    import warnings

    deadline = time.monotonic() + timeout_s
    try:
        while time.monotonic() < deadline:
            # non-blocking readiness probe (JVM Observation.getRowOrEmpty)
            if o._jo.getRowOrEmpty().isDefined():
                return o.get
            time.sleep(0.05)
    except Exception:  # noqa: BLE001 — private accessor moved in a PySpark
        # upgrade: fall back to the blocking get (normal path — every
        # observed frame is materialized by the batch writes above)
        return o.get
    warnings.warn(
        f"observation {name!r} not materialized after {timeout_s}s "
        "(observed frame never consumed by an action?) — skipping its "
        "stage counters",
        RuntimeWarning,
        stacklevel=2,
    )
    return None


def read_pixel_stream(
    spark: SparkSession,
    input_dir: str,
    *,
    max_files_per_trigger: int = 1,
    path_glob: str | None = None,
    settle_seconds: float = 0.0,
) -> DataFrame:
    """T1: the landing-directory stream (S9's watchdog analog).

    ``path_glob`` maps the reference's include/exclude filename regex (F10)
    onto the source's ``pathGlobFilter``.
    """
    reader = (
        spark.readStream.format("parquet")
        .schema(PIXEL_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    df = reader.load(input_dir)
    if settle_seconds > 0:
        df = df.where(
            F.col("_metadata.file_modification_time")
            <= F.current_timestamp() - F.expr(f"INTERVAL {settle_seconds} SECONDS")
        )
    return df


@dataclass
class StreamingImagePipeline:
    """foreachBatch driver: per-batch image plan + incremental csim.

    ``calib`` is the one-time calibration table (T2's CacheCreator analog);
    outputs land under ``out_dir/<table>`` as append-only parquet.
    """

    spark: SparkSession
    calib: DataFrame
    controls: ImageControls
    out_dir: str
    broadcast_calib: bool = True
    gradient_stage: bool = False
    observe_metrics: bool = False
    # local_checkpoint truncates lineage at the plan's reuse boundaries:
    # the per-image plan is deep, and eager re-analysis otherwise costs the
    # driver ~30 s per BATCH (size-independent). foreachBatch retries a
    # failed batch wholesale, so the lost fault-tolerance of the
    # checkpointed RDDs is already covered one level up.
    barrier: str = "local_checkpoint"
    # K3 viz parity: also materialize per-image `<id>_base.tif` /
    # `<id>_outliermask.tif` boolean rasters under out_dir/masks
    # (pipeline.py:152-159, 196-216) — off by default (parquet is the
    # source of truth; the TIFFs are for legacy viewers)
    render_masks: bool = False
    # output-table format: None resolves via tables.resolve_table_format
    # (conf spark.xrdspark.tableFormat / env XRDSPARK_TABLE_FORMAT /
    # parquet). "delta" gives ACID appends where delta-spark is installed
    # and falls back to parquet (with a warning) where it isn't.
    table_format: str | None = None
    batches_seen: int = field(default=0, init=False)
    _query: StreamingQuery | None = field(default=None, init=False)
    _start_kwargs: dict = field(default_factory=dict, init=False)

    def _path(self, table: str) -> str:
        return os.path.join(self.out_dir, table)

    # ---- T4 control surface (the reference UI's Pause / Clear Queue) ----

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.out_dir, "control", "skip_manifest.json")

    def _load_skip_names(self) -> set[str]:
        import json

        try:
            with open(self._manifest_path) as f:
                return set(json.load(f))
        except (FileNotFoundError, ValueError):
            return set()

    def clear_queue(self, input_dir: str, glob: str = "*") -> int:
        """Snapshot currently-visible landing files into the skip manifest
        (the reference's queue.clear()). Files already processed are
        unaffected (the checkpoint never replays them); pending files are
        dropped at the source on the next (re)start. Returns the manifest
        size. Call while paused — a running query applies the manifest it
        loaded at start."""
        import fnmatch
        import json

        names = self._load_skip_names()
        try:
            names.update(
                n for n in os.listdir(input_dir) if fnmatch.fnmatch(n, glob)
            )
        except FileNotFoundError:
            pass
        os.makedirs(os.path.dirname(self._manifest_path), exist_ok=True)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(names), f)
        os.replace(tmp, self._manifest_path)
        return len(names)

    def _prune_skip_manifest(self, checkpoint_dir: str) -> None:
        """The manifest only ever grows (clear_queue unions into it), and
        clear_queue snapshots ALL visible landing files — including ones the
        checkpoint already committed, which the file source never replays
        anyway. Prune those on (re)start so a long-lived deployment's
        source-side ``isin`` literal stays bounded by genuinely-pending
        skips instead of the full processing history.

        Only files in COMMITTED batches are pruned. Source logs are written
        at batch-planning time, so after a mid-batch crash the in-flight
        batch's files appear under ``sources/*`` without a matching
        ``commits/<id>`` — those files WILL be replayed on restart, and if
        the operator cleared the queue while stopped, their skip entries
        must survive the prune so the replayed batch's rows are filtered at
        the source (the reference's queue.clear() drops every pending file,
        and a planned-but-uncommitted file is still pending: none of its
        outputs exist)."""
        import glob as _glob
        import json

        names = self._load_skip_names()
        if not names:
            return
        try:
            committed = set(os.listdir(os.path.join(checkpoint_dir, "commits")))
        except OSError:
            committed = set()
        processed: set[str] = set()
        for log in _glob.glob(os.path.join(checkpoint_dir, "sources", "*", "*")):
            if not os.path.isfile(log):
                continue
            try:
                with open(log) as f:
                    for line in f:
                        line = line.strip()
                        if not line.startswith("{"):
                            continue  # version header / offsets
                        try:
                            entry = json.loads(line)
                        except ValueError:
                            continue
                        path = entry.get("path")
                        # each entry records its planning batch ("batchId"
                        # in both per-batch and .compact log files); prune
                        # only when that batch reached commits/. An entry
                        # without a batchId is conservatively kept.
                        bid = entry.get("batchId")
                        if path and bid is not None and str(bid) in committed:
                            processed.add(os.path.basename(path))
            except OSError:
                continue
        kept = names - processed
        if kept != names:
            os.makedirs(os.path.dirname(self._manifest_path), exist_ok=True)
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(kept), f)
            os.replace(tmp, self._manifest_path)

    def pause(self) -> None:
        """Stop the running query, keeping the checkpoint (= the queue)."""
        if self._query is not None:
            self._query.stop()
            self._query.awaitTermination()

    def resume(self) -> StreamingQuery:
        """Restart from the checkpoint with the last ``start`` arguments
        (and the current skip manifest)."""
        if not self._start_kwargs:
            raise RuntimeError("resume() before start()")
        return self.start(**self._start_kwargs)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches_seen += 1
        if batch_df.isEmpty():
            return
        batch_df = batch_df.select(
            "dataset", "seq", "image_id", "y", "x", "intensity"
        )
        from xrddatapipeline_spark.tables import write_table

        # pixel store first: partitioned by (dataset, seq) so the csim
        # lookback and any reprocessing read only the partitions they need.
        write_table(
            batch_df, self._path("pixels"),
            partition_by=("dataset", "seq"), fmt=self.table_format,
        )

        # csim depends ONLY on the pixel store just written (T5 reads the
        # pruned partitions back), so its window-shuffle job overlaps the
        # eager barrier chain inside run_image_plan instead of running
        # serialized after every sink (round 8 — the barriers profile at
        # ~36% of core time; csim is the single biggest independent job)
        from concurrent.futures import ThreadPoolExecutor

        csim_pool = ThreadPoolExecutor(max_workers=1)
        csim_fut = csim_pool.submit(self._append_csim, batch_df)

        # everything from here on sits inside the try so that a failure in
        # run_image_plan itself (not just in a sink) still reaches the
        # csim_pool.shutdown(wait=True) below — otherwise the csim thread
        # would be orphaned with its append-mode write possibly still in
        # flight when foreachBatch retries the batch, racing the retry's
        # _append_csim into duplicate (dataset, seq) rows.
        res = None
        try:
            res = run_image_plan(
                batch_df,
                self.calib,
                self.controls,
                broadcast_calib=self.broadcast_calib,
                gradient_stage=self.gradient_stage,
                observe=self.observe_metrics,
                barrier=self.barrier,
            )
            # independent sinks over the already-materialized barriers:
            # submit concurrently so stage tails of one output job overlap
            # the ramp-up of the next (measured idle-core gaps between the
            # sequential actions at 8 x 2880^2)
            sinks = [
                (res.integrals, "integrals"),
                (res.spot_stats, "spot_stats"),
                (res.spottiness, "spottiness"),
                (res.outliers, "outliers"),
            ]
            if res.h_maxima is not None:
                # A19: part of the reference's spottiness stage output
                sinks.append((res.h_maxima, "h_maxima"))
            if self.gradient_stage and res.gradient is not None:
                sinks.append((res.gradient.on_arc_labels, "gradient_arcs"))
            def _labeled_write(df: DataFrame, name: str) -> None:
                # name the sink job's stages in the UI/REST profile
                # (callSite.short is thread-local; each sink has its own
                # pool thread) — same attribution scheme as the barriers
                sc = self.spark.sparkContext
                sc.setLocalProperty("callSite.short", f"sink:{name}")
                try:
                    write_table(df, self._path(name), fmt=self.table_format)
                finally:
                    sc.setLocalProperty("callSite.short", None)

            with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
                futs = [
                    pool.submit(_labeled_write, df, name)
                    for df, name in sinks
                ]
                for f in futs:
                    f.result()
            if self.render_masks:
                from xrddatapipeline_spark.sinks import render_mask_tiffs

                shape = (self.controls.size_y, self.controls.size_x)
                masks_dir = self._path("masks")
                render_mask_tiffs(
                    res.pixels.where(F.col("base_mask")), shape,
                    masks_dir, "_base",
                ).collect()
                render_mask_tiffs(
                    res.outliers, shape, masks_dir, "_outliermask"
                ).collect()
            # join the overlapped csim job (submitted before
            # run_image_plan); surfaces any csim failure here, after the
            # sinks, exactly where the serialized call used to run
            csim_fut.result()
            if self.observe_metrics and res.observations:
                # A22 analog: the reference prints per-stage counters at
                # Stop (pipeline_queue.py:1007-1014); here each batch
                # appends one row of stage counters, harvested for free
                # from the writes above (Observation piggybacks on the
                # materializing action — no extra job).
                flat: dict[str, int] = {"batch_id": int(batch_id)}
                for name, o in res.observations.items():
                    # Observation.get blocks until an action materializes
                    # the observed frame; with barrier='persist' a frame no
                    # output consumed would hang the stream forever — bound
                    # the wait and skip (with a warning) instead of hanging.
                    got = _observation_get(o, name, timeout_s=60.0)
                    if got is not None:
                        flat.update({k: int(v) for k, v in got.items()})
                self.spark.createDataFrame([flat]).write.mode("append").json(
                    self._path("stage_metrics")
                )
        finally:
            # csim must be settled (done or failed) before the batch's
            # frames are unpersisted — shutdown(wait=True) guarantees it
            # on every exit path, including run_image_plan raising before
            # res exists
            csim_pool.shutdown(wait=True)
            if res is not None:
                res.unpersist_all()

    def _append_csim(self, batch_df: DataFrame) -> None:
        """T5: csim vs previous/first via the pixel store (J4-over-store).

        Reads only the (dataset, seq) partitions needed: the batch images,
        each predecessor seq, and seq 0 of each touched dataset — a
        partition-pruned scan however large the store grows.
        """
        touched = [
            (r.dataset, r.seq)
            for r in batch_df.select("dataset", "seq").distinct().collect()
        ]
        needed = set()
        for ds, seq in touched:
            needed.update({(ds, seq), (ds, seq - 1), (ds, 0)})
        cond = F.lit(False)
        for ds, seq in sorted(needed):
            cond = cond | ((F.col("dataset") == ds) & (F.col("seq") == seq))
        from xrddatapipeline_spark.tables import read_table, write_table

        store = read_table(
            self.spark, self._path("pixels"),
            fmt=self.table_format, schema=PIXEL_SCHEMA,
        )
        series = cosine_similarity_series(store.where(cond))
        batch_keys = F.lit(False)
        for ds, seq in touched:
            batch_keys = batch_keys | (
                (F.col("dataset") == ds) & (F.col("seq") == seq)
            )
        write_table(series.where(batch_keys), self._path("csim"),
                    fmt=self.table_format)

    def start(
        self,
        input_dir: str,
        checkpoint_dir: str,
        *,
        available_now: bool = True,
        processing_interval: str | None = None,
        max_files_per_trigger: int = 1,
        path_glob: str | None = None,
        settle_seconds: float = 0.0,
        source_format: str = "parquet",
    ) -> StreamingQuery:
        """Start the stream. ``available_now=True`` is the reference's
        'process existing images only' auto-stop mode (T4); a
        ``processing_interval`` (e.g. '1 second') is the live-watch mode.
        ``source_format='tiff'`` watches a directory of detector TIFFs
        (the reference's actual input) and decodes them in-stream;
        'parquet' expects pre-decoded pixel files (PIXEL_SCHEMA)."""
        self._start_kwargs = dict(
            input_dir=input_dir,
            checkpoint_dir=checkpoint_dir,
            available_now=available_now,
            processing_interval=processing_interval,
            max_files_per_trigger=max_files_per_trigger,
            path_glob=path_glob,
            settle_seconds=settle_seconds,
            source_format=source_format,
        )
        self._prune_skip_manifest(checkpoint_dir)
        skip_names = self._load_skip_names()
        if source_format == "tiff":
            from xrddatapipeline_spark.sources.tiff import stream_tiff_images

            stream = stream_tiff_images(
                self.spark,
                input_dir,
                glob=path_glob or "*.tif*",
                max_files_per_trigger=max_files_per_trigger,
                skip_names=skip_names,
            )
        else:
            stream = read_pixel_stream(
                self.spark,
                input_dir,
                max_files_per_trigger=max_files_per_trigger,
                path_glob=path_glob,
                settle_seconds=settle_seconds,
            )
            if skip_names:
                # cleared-queue files dropped at the source; basename match
                # (the manifest stores names, sources expose file:/ URIs).
                # The manifest is a small driver-side literal list — the
                # filter is a pushed-down scan predicate, no join.
                stream = stream.where(
                    ~F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ).isin(sorted(skip_names))
                )
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_interval:
            writer = writer.trigger(processingTime=processing_interval)
        self._query = writer.start()
        return self._query

    def output(self, table: str) -> DataFrame:
        """Read-back view over an output table (§3.3 query surface)."""
        from xrddatapipeline_spark.tables import read_table

        if table == "stage_metrics":  # JSON sidecar, not a columnar table
            return self.spark.read.json(self._path(table))
        return read_table(self.spark, self._path(table), fmt=self.table_format)
