"""The crack-request stream (SURVEY.md §2.9 T1).

Reference behavior: the server main loop consumes `"c <hash> <lower>
<upper>"` requests forever (server.c:477-505), fans each out to workers,
and replies `"f <pass>"` / `"x"` (server.c:243-273).

Spark mapping: an unbounded DataFrame of request rows (file/directory
source in production — any stream source works, schema is the contract),
processed per micro-batch with ``foreachBatch`` running Q-CORE for each
request, appending verdict rows to a sink.  Queueing, at-least-once
delivery and retries are Spark's (the reference's hand-rolled LSP layer and
its defects — lost requests on zero workers, server.c:382-385 — vanish).

Per-batch the requests are grouped by (hash, width) so duplicate hashes
scan the keyspace once, then joined against the generated keyspace — i.e.
the scan is *shared* across same-width requests: one pass over the width-w
space answers every width-w request in the batch (the reference scans the
full space per request, per worker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.keyspace import keyspace

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.LongType()),
        T.StructField("hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("submitted_at", T.TimestampType()),
    ]
)

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.LongType()),
        T.StructField("found", T.BooleanType()),
        T.StructField("password", T.StringType()),
        T.StructField("reply", T.StringType()),
    ]
)


def answer_request_batch(
    spark: SparkSession, requests: DataFrame, hash_func: str = "sha1"
) -> DataFrame:
    """Answer a (bounded) batch of crack requests with ONE shared keyspace
    scan per distinct width.  Returns VERDICT_SCHEMA rows."""
    widths = [
        r["width"] for r in requests.select("width").distinct().collect()
    ]  # tiny driver-side list: one entry per distinct width (≤13)
    verdicts = None
    for w in widths:
        reqs_w = requests.filter(F.col("width") == w)
        ks = keyspace(spark, w)
        hashed = ks.select(
            "candidate",
            (
                F.sha1(F.col("candidate"))
                if hash_func == "sha1"
                else F.sha2(F.col("candidate"), 256)
            ).alias("digest"),
        )
        # lower() normalizes request-supplied hex: crack() lowercases its
        # target digest, and an uppercase-hex request must not silently miss
        hits = (
            hashed.join(
                F.broadcast(reqs_w.select("request_id", "hash")),
                F.col("digest") == F.lower(F.col("hash")),
            )
            .groupBy("request_id")
            .agg(F.min("candidate").alias("password"))
        )
        # hits is post-aggregation (≤ batch-size rows, one per request):
        # without the explicit hint the planner loses the broadcast and
        # pays a two-exchange SortMergeJoin per micro-batch on a ≤3-row
        # side (round-10 verdict).
        batch_verdict = (
            reqs_w.select("request_id")
            .join(F.broadcast(hits), "request_id", "left")
            .select(
                "request_id",
                F.col("password").isNotNull().alias("found"),
                "password",
                F.when(
                    F.col("password").isNotNull(),
                    F.concat(F.lit("f "), F.col("password")),
                )
                .otherwise(F.lit("x"))
                .alias("reply"),
            )
        )
        verdicts = batch_verdict if verdicts is None else verdicts.unionAll(batch_verdict)
    if verdicts is None:
        return spark.createDataFrame([], VERDICT_SCHEMA)
    return verdicts


def start_request_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_table: str = "crack_verdicts",
    hash_func: str = "sha1",
    available_now: bool = True,
    transform=None,
):
    """readStream over a directory of request files (json lines matching
    REQUEST_SCHEMA) → foreachBatch Q-CORE → in-memory sink table.

    ``available_now`` drains what exists then stops (test/batch-catchup
    mode); False tails the directory forever like the reference's server
    loop.

    ``transform`` (optional) is applied to the streaming frame BEFORE
    the per-batch crack — the composition point for stateless stream
    operators such as the T4 loss injector
    (streaming/faults.inject_faults), mirroring the reference's lossy
    transport sitting between client and server (sendto_maydrop,
    lsp_common.c:42-95).  It must be a narrow, streaming-legal
    DataFrame transform.
    """
    stream = (
        spark.readStream.schema(REQUEST_SCHEMA)
        .json(source_dir)
    )
    if transform is not None:
        stream = transform(stream)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = answer_request_batch(spark, batch_df, hash_func)
        out.write.mode("append").saveAsTable(sink_table)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
