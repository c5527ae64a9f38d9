"""foreachBatch idempotent sink: end-to-end file pipeline with
checkpoint recovery semantics (replaying a batch must not duplicate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thrive_spark.streaming.sinks import idempotent_parquet_sink, start_file_pipeline
from thrive_spark.tables import Tables
from tests.test_streaming import read_stream  # reuse the chunked source


def test_idempotent_sink_exactly_once(spark, sf_dir, stream_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_file_pipeline(
        spark, read_stream(spark, stream_dir), out, ckpt
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    want = Tables(spark, sf_dir).events
    assert got.count() == want.count()
    # every source event delivered exactly once
    assert got.select("event_id").distinct().count() == want.count()

    # replay a batch (checkpoint recovery re-delivers): rewriting the
    # same batch partition must be a no-op, not a duplication
    batch0 = got.filter(F.col("batch_id") == 0).drop("batch_id")
    idempotent_parquet_sink(out)(batch0, 0)
    assert spark.read.parquet(out).count() == want.count()


def test_cdc_apply_batch_never_collects_payload(spark, tmp_path, monkeypatch):
    """r16 gate (r15 verdict #2): the CDC-mirror apply path must not
    materialize a batch's payload rows on the driver — the only
    permitted collects are the (version, change_type) count summary
    and the equality-delete KEY column. Also pins correctness: the
    mirror equals the source fold, and a replayed batch is a no-op."""
    from thrive_spark.sources.iceberg_lite import IcebergLiteTable
    from thrive_spark.streaming.sinks import _cdc_apply_batch

    mirror_root = str(tmp_path / "mirror")
    mirror = IcebergLiteTable(spark, mirror_root)
    mirror.create(spark.createDataFrame(
        [], "k bigint, status string, p double"
    ))

    # version 1 inserts 500 keys, version 2 deletes half and updates
    # one (preimage+postimage) — several versions in ONE batch
    ins1 = spark.range(500).select(
        F.col("id").alias("k"), F.lit("A").alias("status"),
        (F.col("id") * 1.0).alias("p"),
        F.lit("insert").alias("_change_type"),
        F.lit(1).cast("long").alias("_commit_version"),
    )
    dels2 = spark.range(0, 500, 2).select(
        F.col("id").alias("k"), F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("p"),
        F.lit("delete").alias("_change_type"),
        F.lit(2).cast("long").alias("_commit_version"),
    )
    upd2 = spark.createDataFrame(
        [(1, "A", 1.0, "update_preimage", 2),
         (1, "Z", 99.0, "update_postimage", 2)],
        "k bigint, status string, p double, _change_type string, "
        "_commit_version long",
    )
    batch = ins1.unionByName(dels2).unionByName(upd2)

    # patch the CONCRETE DataFrame class (pyspark 4 facade classes
    # don't own collect)
    DF = type(spark.range(1))
    allowed = {"_commit_version", "_change_type", "count", "k"}
    seen = []
    orig = DF.collect

    def gated(self):
        seen.append(tuple(self.columns))
        assert set(self.columns) <= allowed, (
            f"driver collect of payload columns: {self.columns}"
        )
        return orig(self)

    monkeypatch.setattr(DF, "collect", gated)
    _cdc_apply_batch(
        mirror_root, batch, 0, key_cols=["k"],
        data_schema="k bigint, status string, p double",
    )
    monkeypatch.setattr(DF, "collect", orig)
    assert seen, "the apply path ran no gated collects?"

    got = {r.k: (r.status, r.p) for r in mirror.snapshot().collect()}
    assert len(got) == 250
    assert got[1] == ("Z", 99.0)      # update applied
    assert 0 not in got and 2 not in got  # deletes applied
    assert got[3] == ("A", 3.0)

    # replayed batch: checkpoint gate makes it a no-op
    sid = mirror.metadata()["current-snapshot-id"]
    _cdc_apply_batch(
        mirror_root, batch, 0, key_cols=["k"],
        data_schema="k bigint, status string, p double",
    )
    assert mirror.metadata()["current-snapshot-id"] == sid
