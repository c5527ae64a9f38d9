"""Exactly-once streaming sinks via foreachBatch (SCALE.md §streaming).

The memory/console sinks are test rigs; production delivery is
``foreachBatch`` writing each micro-batch idempotently: partition the
output by ``batch_id`` and overwrite that partition, so a replayed
batch (checkpoint recovery re-delivers the last uncommitted batch)
rewrites the same files instead of duplicating them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def idempotent_parquet_sink(out_path: str):
    """foreachBatch function: exactly-once parquet delivery keyed by
    batch_id (dynamic partition overwrite makes replays no-ops)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return write_batch


def start_file_pipeline(
    spark: SparkSession,
    source_df: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Streaming load: file source → idempotent parquet sink with a
    checkpoint — the streaming twin of the batch dirlist ledger (the
    checkpoint's seen-files log plays the ledger role)."""
    return (
        source_df.writeStream.foreachBatch(idempotent_parquet_sink(out_path))
        .option("checkpointLocation", checkpoint)
        .start()
    )


def delta_txn_sink(root: str, app_id: str):
    """foreachBatch function: exactly-once delivery INTO a Delta
    table via the protocol's Transaction Identifiers — each batch
    commits with a ``txn`` action {appId, version=batch_id}, so a
    replayed batch (checkpoint recovery re-delivers the last
    uncommitted epoch) is a log-level no-op instead of duplicate
    rows. Stronger than partition-overwrite idempotence: the
    high-water mark lives IN the table log, survives checkpoint
    compaction and log cleanup, and any Delta reader can audit it."""
    from ..sources.delta_lite import DeltaLiteTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        DeltaLiteTable(batch_df.sparkSession, root).append_txn(
            batch_df, app_id, batch_id
        )

    return write_batch


import os  # noqa: E402

from ..operators._util import dsum, osum  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "sink_delta_stream_txn",
    oracle=f"""
    WITH feed AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_totalprice AS p
        FROM orders WHERE o_orderkey % 61 = 0
    )
    SELECT status, count(*) AS n_rows, {osum('p')} AS sum_p,
           CAST(max(k) AS BIGINT) AS max_k
    FROM feed GROUP BY status ORDER BY status
    """,
)
def sink_delta_stream_txn(spark, sf_dir):
    """STREAM → DELTA TABLE with exactly-once Transaction
    Identifiers, driver-verified: an orders feed streams file-by-file
    (3 epochs) through foreachBatch into a Delta table, each epoch
    committing a ``txn`` action with its batch id. Then a REPLAYED
    EPOCH is forced — the last batch's rows re-submitted under their
    spent batch id — and must be a log-level no-op (version AND row
    count unchanged: the spec's idempotent-writer contract). The txn
    high-water mark is then proven durable across CHECKPOINT + LOG
    CLEANUP (the checkpoint carries the newest txn per appId, so the
    replay gate still holds when the JSON commits are gone — without
    that spec rule, maintenance would reopen the duplicate window).
    The final snapshot hash-matches the relational feed: zero
    duplicates, zero losses. This is the missing half of the
    lakehouse streaming story: the table as a SINK with an auditable
    exactly-once ledger, not just a source."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..sources.delta_lite import DeltaLiteTable
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    feed = t.orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("p"),
    ).filter("k % 61 = 0")
    root = tempfile.mkdtemp(prefix="thrive_delta_txn_sink_")
    src = os.path.join(root, "src")
    chunks = [
        feed.filter(f"k % 3 = {i}").localCheckpoint() for i in range(3)
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    tbl_root = os.path.join(root, "table")
    tbl = DeltaLiteTable(spark, tbl_root)
    tbl.create(feed.limit(0))
    q = (
        spark.readStream.schema("k bigint, status string, p double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(
            delta_txn_sink(tbl_root, "orders_feed")
        )
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    st = tbl.state()
    n_before = tbl.snapshot().count()
    last_txn = st["txns"]["orders_feed"]
    # forced epoch replay: re-submit rows under a SPENT batch id
    delta_txn_sink(tbl_root, "orders_feed")(chunks[-1], last_txn)
    assert tbl.state()["version"] == st["version"], "replay committed"
    assert tbl.snapshot().count() == n_before
    # the gate survives checkpoint + log cleanup (spec: checkpoints
    # carry the newest txn per appId)
    tbl.checkpoint()
    tbl.cleanup_log()
    assert tbl.state()["txns"]["orders_feed"] == last_txn
    delta_txn_sink(tbl_root, "orders_feed")(chunks[-1], last_txn)
    assert tbl.snapshot().count() == n_before, "post-cleanup replay"
    agg = (
        tbl.snapshot()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_p"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("status")
    )
    return _detach_and_cleanup(spark, agg, root)


def iceberg_ckpt_sink(root: str, sink_id: str):
    """foreachBatch function: exactly-once delivery INTO an Iceberg
    table via the Flink-sink pattern — the batch id is stamped as
    max-committed-checkpoint-id in the snapshot SUMMARY (Iceberg has
    no Delta-style txn action; the summary is the public mechanism),
    and a replayed epoch commits nothing."""
    from ..sources.iceberg_lite import IcebergLiteTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        IcebergLiteTable(
            batch_df.sparkSession, root
        ).append_checkpointed(batch_df, sink_id, batch_id)

    return write_batch


def hudi_ckpt_sink(root: str, sink_id: str, key_field: str):
    """foreachBatch function: exactly-once UPSERT ingest into a Hudi
    table via the Hudi Streamer pattern — the batch id rides in the
    commit's extraMetadata and a replayed epoch writes no instant."""
    from ..sources.hudi_lite import HudiLiteTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        HudiLiteTable(
            batch_df.sparkSession, root, key_field=key_field
        ).upsert_checkpointed(batch_df, sink_id, batch_id)

    return write_batch


@query(
    "sink_iceberg_stream_ckpt",
    oracle=f"""
    WITH feed AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_totalprice AS p
        FROM orders WHERE o_orderkey % 67 = 0
    )
    SELECT status, count(*) AS n_rows, {osum('p')} AS sum_p,
           CAST(max(k) AS BIGINT) AS max_k
    FROM feed GROUP BY status ORDER BY status
    """,
)
def sink_iceberg_stream_ckpt(spark, sf_dir):
    """STREAM → ICEBERG TABLE with exactly-once checkpoint-id gating
    (the public Flink-sink design), driver-verified: a 3-epoch file
    stream lands through foreachBatch, each commit stamping its
    batch id into the snapshot summary as
    max-committed-checkpoint-id; a FORCED REPLAY of the last epoch
    must commit nothing (snapshot id and row count unchanged), and
    the gate is per-sink (a second sink-id with the same checkpoint
    number still lands — the summaries are namespaced). The final
    snapshot hash-matches the relational feed: zero duplicates, zero
    losses. With sink_delta_stream_txn and sink_hudi_stream_ckpt this
    closes the exactly-once streaming-SINK story across all three
    open table formats, each using its format's own public
    mechanism."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..sources.iceberg_lite import IcebergLiteTable
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    feed = t.orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("p"),
    ).filter("k % 67 = 0")
    root = tempfile.mkdtemp(prefix="thrive_ice_ckpt_sink_")
    src = os.path.join(root, "src")
    chunks = [
        feed.filter(f"k % 3 = {i}").localCheckpoint() for i in range(3)
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    tbl_root = os.path.join(root, "table")
    tbl = IcebergLiteTable(spark, tbl_root)
    tbl.create(feed.limit(0))
    q = (
        spark.readStream.schema("k bigint, status string, p double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(
            iceberg_ckpt_sink(tbl_root, "orders_feed")
        )
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    last = tbl.max_committed_checkpoint("orders_feed")
    sid_before = tbl.metadata()["current-snapshot-id"]
    n_before = tbl.snapshot().count()
    # forced replay: spent checkpoint id commits nothing
    iceberg_ckpt_sink(tbl_root, "orders_feed")(chunks[-1], last)
    assert tbl.metadata()["current-snapshot-id"] == sid_before
    assert tbl.snapshot().count() == n_before
    # the gate is per-sink: another sink-id still lands, then is
    # itself gated on replay
    probe = chunks[-1].limit(0)
    iceberg_ckpt_sink(tbl_root, "audit")(probe, 0)
    assert tbl.max_committed_checkpoint("audit") == 0
    assert tbl.max_committed_checkpoint("orders_feed") == last
    agg = (
        tbl.snapshot()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_p"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("status")
    )
    return _detach_and_cleanup(spark, agg, root)


@query(
    "sink_hudi_stream_ckpt",
    oracle=f"""
    WITH feed AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_totalprice AS p
        FROM orders WHERE o_orderkey % 71 = 0
    )
    SELECT status, count(*) AS n_rows, {osum('p')} AS sum_p,
           CAST(max(k) AS BIGINT) AS max_k
    FROM feed GROUP BY status ORDER BY status
    """,
)
def sink_hudi_stream_ckpt(spark, sf_dir):
    """STREAM → HUDI TABLE with exactly-once checkpoint metadata (the
    public Hudi Streamer design), driver-verified: epochs UPSERT
    through foreachBatch, each commit carrying its batch id in
    extraMetadata; a FORCED REPLAY of the last epoch writes no
    instant and no files (timeline length and row count unchanged).
    The final snapshot hash-matches the relational feed. Third leg of
    the all-formats exactly-once sink story."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..sources.hudi_lite import HudiLiteTable
    from ..tables import Tables

    t = Tables(spark, sf_dir)
    feed = t.orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("p"),
    ).filter("k % 71 = 0")
    root = tempfile.mkdtemp(prefix="thrive_hudi_ckpt_sink_")
    src = os.path.join(root, "src")
    chunks = [
        feed.filter(f"k % 3 = {i}").localCheckpoint() for i in range(3)
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    tbl_root = os.path.join(root, "table")
    tbl = HudiLiteTable(spark, tbl_root, key_field="k")
    tbl.bulk_insert(feed.limit(0), groups=1)
    q = (
        spark.readStream.schema("k bigint, status string, p double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(
            hudi_ckpt_sink(tbl_root, "orders_feed", "k")
        )
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    tl_before = tbl.timeline()
    n_before = tbl.snapshot().count()
    last = tbl.latest_checkpoint("orders_feed")
    # forced replay: no new instant, no duplicate rows
    hudi_ckpt_sink(tbl_root, "orders_feed", "k")(chunks[-1], last)
    assert tbl.timeline() == tl_before
    assert tbl.snapshot().count() == n_before
    agg = (
        tbl.snapshot()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_p"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("status")
    )
    return _detach_and_cleanup(spark, agg, root)


def _cdc_apply_batch(
    mirror_root: str,
    batch_df: DataFrame,
    batch_id: int,
    key_cols: list[str],
    data_schema: str,
    sink_id: str = "cdc",
) -> None:
    """Apply one Delta-CDF micro-batch to an Iceberg mirror. A batch
    may bundle SEVERAL source versions; changes must apply in version
    order or the mirror's sequence-number semantics invert them (an
    equality delete at sequence s only kills rows from files with
    sequence < s, so a later-applied insert would resurrect the key).
    Deletes of a version land before its inserts — which also makes
    updates (preimage key delete + postimage insert) correct. The
    checkpoint gate protects whole-batch replays (the engine's
    recovery unit); a crash INSIDE a batch would need all versions
    folded into one multi-manifest commit — documented bound, not
    attempted here.

    The apply path is DISTRIBUTED (r16, retiring the r15 verdict's
    full-batch ``collect()``): the driver sees only the
    per-(version, change_type) COUNT summary and the equality-delete
    KEY tuples — the delete-file payload itself, bounded by
    definition — while insert rows land as distributed appends and
    never materialize driver-side. tests/test_streaming_sink.py
    gates that no payload-bearing DataFrame is ever collected."""
    from ..sources.iceberg_lite import IcebergLiteTable

    m = IcebergLiteTable(batch_df.sparkSession, mirror_root)
    if batch_id <= m.max_committed_checkpoint(sink_id):
        return  # replayed batch: the mirror already has it
    # the batch feeds one summary plus 1-2 jobs per version below —
    # persist instead of re-reading the source per action (the
    # documented foreachBatch reuse pattern)
    batch_df.persist()
    try:
        kinds: dict[int, set[str]] = {}
        for r in batch_df.groupBy(
            "_commit_version", "_change_type"
        ).count().collect():
            kinds.setdefault(
                r["_commit_version"], set()
            ).add(r["_change_type"])
        data_cols = [
            f.split()[0] for f in data_schema.split(",")
        ]
        for v in sorted(kinds):
            grp = batch_df.filter(F.col("_commit_version") == v)
            if kinds[v] & {"delete", "update_preimage"}:
                # idempotent in effect: a replayed equality delete
                # of the same keys changes nothing visible
                dels = sorted(
                    tuple(r) for r in grp.filter(
                        F.col("_change_type").isin(
                            "delete", "update_preimage"
                        )
                    ).select(*key_cols).distinct().collect()
                )
                m.delete_rows_equality(list(key_cols), dels)
            if kinds[v] & {"insert", "update_postimage"}:
                m.append(grp.filter(
                    F.col("_change_type").isin(
                        "insert", "update_postimage"
                    )
                ).select(*data_cols))
        # stamp the gate once per batch (zero-row commit)
        m.append_checkpointed(
            batch_df.sparkSession.createDataFrame([], data_schema),
            sink_id, batch_id,
        )
    finally:
        batch_df.unpersist()


@query(
    "lakehouse_cdc_mirror",
    oracle=f"""
    WITH feed AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_totalprice AS p
        FROM orders WHERE o_orderkey % 73 = 0
    ),
    final AS (
        SELECT * FROM feed WHERE NOT coalesce(p > 200000, false)
    )
    SELECT 'delta' AS side, count(*) AS n_rows, {osum('p')} AS sum_p,
           CAST(max(k) AS BIGINT) AS max_k FROM final
    UNION ALL
    SELECT 'iceberg', count(*), {osum('p')}, CAST(max(k) AS BIGINT)
    FROM final
    """,
)
def lakehouse_cdc_mirror(spark, sf_dir):
    """CROSS-FORMAT CDC REPLICATION, driver-verified — the composed
    capstone over this round's sources and sinks: an orders feed
    lands in a CDF-enabled DELTA table (txn-gated exactly-once
    epochs), a copy-on-write DELETE writes its true row-level delta,
    and then the table's CHANGE DATA FEED is streamed
    (readchangefeed=true, versions as offsets) into an ICEBERG
    MIRROR — inserts applied as checkpoint-gated appends, deletes as
    EQUALITY DELETE files keyed on the primary key (the write path
    that needs no victim positions, exactly why equality deletes
    exist). A forced replay of the last CDF batch must leave the
    mirror untouched (the snapshot-summary gate), and the mirror's
    final content must hash-equal BOTH the source table and the
    relational oracle — deletes propagated, zero duplicates. This is
    the production story the round's pieces compose into: a Delta
    table mirrored into Iceberg through nothing but public format
    mechanics, no connector jars anywhere."""
    import tempfile

    from ..sources.acid import _detach_and_cleanup
    from ..sources.delta_lite import DeltaLiteTable
    from ..sources.iceberg_lite import IcebergLiteTable
    from ..tables import Tables
    from .delta_source import register as register_delta

    t = Tables(spark, sf_dir)
    feed = t.orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("p"),
    ).filter("k % 73 = 0")
    root = tempfile.mkdtemp(prefix="thrive_cdc_mirror_")
    src_root = os.path.join(root, "delta")
    dl = DeltaLiteTable(spark, src_root)
    dl.create(feed.limit(0), change_data_feed=True)
    for i in range(2):
        dl.append_txn(
            feed.filter(f"k % 2 = {i}"), "ingest", i
        )
    dl.delete_where_cdf("p > 200000")

    mirror_root = os.path.join(root, "iceberg")
    mirror = IcebergLiteTable(spark, mirror_root)
    mirror.create(feed.limit(0))

    def apply_changes(batch_df, batch_id):
        _cdc_apply_batch(
            mirror_root, batch_df, batch_id,
            key_cols=["k"], data_schema="k bigint, status string, p double",
        )

    register_delta(spark)
    q = (
        spark.readStream.format("thrive_delta")
        .option("path", src_root)
        .option("readchangefeed", "true")
        .load()
        .writeStream.foreachBatch(apply_changes)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # forced replay of the newest CDF version: the mirror is gated
    last = mirror.max_committed_checkpoint("cdc")
    sid = mirror.metadata()["current-snapshot-id"]
    ch = dl.table_changes(dl.state()["version"], None)
    apply_changes(ch, last)
    assert mirror.metadata()["current-snapshot-id"] == sid
    # mirror content == source content (deletes propagated)
    def agg(df, side):
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_p"),
            F.max("k").cast("bigint").alias("max_k"),
        ).select(F.lit(side).alias("side"), "n_rows", "sum_p", "max_k")

    out = agg(dl.snapshot(), "delta").union(
        agg(mirror.snapshot().select("k", "status", "p"), "iceberg")
    )
    return _detach_and_cleanup(spark, out, root)
