"""spark-submit CLI for the nine reference jobs.

The reference exposes each job as a main class with Scallop options
(StreamingJobBase.scala:60-90, ErrorAggregatorBase.scala:280-300); a
user switching engines runs the same shapes here:

    spark-submit --py-files tss.zip -m telemetry_streaming_spark.cli \
        error_aggregator --kafka-broker $B --output-path s3://... \
        --checkpoint-path s3://.../ckpt
    python -m telemetry_streaming_spark.cli error_aggregator \
        --input-path day/ --from 20240101 --to 20240102 --output-path out/

Option names mirror the reference (kafkaBroker -> --kafka-broker,
startingOffsets -> --starting-offsets, outputPath/numParquetFiles/
failOnDataLoss likewise; --from/--to select date-named subdirectories
of --input-path exactly like the reference's S3 date partitions).

Source selection: --kafka-broker (streaming), --stream-input (file
stream standing in for the topic — the S4 test source), or
--input-path (batch; --format heka reads the reference's actual wire
format via sources/heka.py).  HTTP/UDP-sink jobs accept --url /
--statsd-host, or --output-path as the offline fallback that writes
the exact request bodies to files — the same payloads, inspectable.

``--explain`` prints the physical plan and exits without executing —
the plan-review step a 100TB operator runs before launching.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession


def _add_common(p: argparse.ArgumentParser, streaming_sink: bool = True) -> None:
    src = p.add_argument_group("source")
    src.add_argument("--kafka-broker")
    src.add_argument("--topic", default="telemetry")
    src.add_argument("--starting-offsets", default="latest")
    src.add_argument("--fail-on-data-loss", action="store_true")
    src.add_argument("--stream-input", help="file-stream dir (S4 test source)")
    src.add_argument("--input-path", help="batch input dir")
    src.add_argument("--format", choices=("json", "heka"), default="json")
    src.add_argument("--from", dest="date_from", help="yyyymmdd (batch)")
    src.add_argument("--to", dest="date_to", help="yyyymmdd (batch)")
    snk = p.add_argument_group("sink")
    snk.add_argument("--output-path")
    snk.add_argument("--checkpoint-path")
    snk.add_argument("--num-parquet-files", type=int, default=60)
    p.add_argument("--explain", action="store_true", help="print plan, do not run")
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    p.add_argument(
        "--raise-on-error",
        action="store_true",
        help="exit nonzero if any input row is rejected by the parse stage "
        "instead of silently dropping it (ErrorAggregatorBase.scala:220, "
        "UptakeEventsToDatadog.scala:117-118)",
    )


def _source(spark: SparkSession, args) -> tuple[DataFrame, bool]:
    """Build the one-column ``value string`` frame every job consumes.
    Returns (df, is_streaming)."""
    if args.kafka_broker:
        from telemetry_streaming_spark.streaming.core import kafka_source

        raw = kafka_source(
            spark, args.kafka_broker, args.topic,
            starting_offsets=args.starting_offsets,
            fail_on_data_loss=args.fail_on_data_loss,
        )
        return raw.selectExpr("CAST(value AS STRING) AS value"), True
    if args.stream_input:
        from telemetry_streaming_spark.streaming.core import text_file_source

        return text_file_source(spark, args.stream_input), True
    if not args.input_path:
        raise SystemExit("one of --kafka-broker / --stream-input / --input-path required")
    paths = [args.input_path]
    if args.date_from and args.date_to:
        days = sorted(
            d for d in os.listdir(args.input_path)
            if d.isdigit() and args.date_from <= d <= args.date_to
        )
        if days:
            paths = [os.path.join(args.input_path, d) for d in days]
    if args.format == "heka":
        from telemetry_streaming_spark.sources.heka import read_heka

        frames = [read_heka(spark, p) for p in paths]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out, False
    return spark.read.text(paths).withColumnRenamed("value", "value"), False


def _write_text(df: DataFrame, col: str, path: str) -> None:
    df.select(col).write.mode("overwrite").text(path)


def _finish(args, df: DataFrame, streaming_writer, batch_writer):
    """Route a prepared frame: --explain prints, streaming starts the
    query and blocks, batch executes the writer."""
    if args.explain:
        df.explain("formatted")
        return None
    if streaming_writer is not None:
        query = streaming_writer()
        query.awaitTermination()
        return query
    return batch_writer()


def _require(args, *names) -> None:
    missing = [n for n in names if not getattr(args, n.replace("-", "_"))]
    if missing:
        raise SystemExit(f"missing required option(s): {', '.join('--' + n for n in missing)}")


def _await_stream_with_reject_guard(spark, start):
    """Run a streaming query under the parse-rejection guard: start()
    returns the query; any micro-batch whose observed ``parse_guard``
    metrics report rows_rejected > 0 stops the query and raises
    ParseRejectionError (ErrorAggregatorBase.scala:220 /
    UptakeEventsToDatadog.scala:117-118 raiseOnError parity)."""
    from telemetry_streaming_spark.observability import (
        ParseRejectionError,
        make_reject_guard_listener,
    )

    guard = make_reject_guard_listener()
    spark.streams.addListener(guard)
    try:
        q = start()
        while q.isActive:
            q.awaitTermination(1)
            if guard.tripped is not None:
                q.stop()
                raise ParseRejectionError(guard.tripped)
        # the listener bus is asynchronous: the final micro-batch's
        # progress event can land after isActive flips false.
        # recentProgress is read SYNCHRONOUSLY from the query handle
        # (no bus race, no sleep), so scan it for any batch the
        # listener missed before declaring success.
        q.awaitTermination()
        if guard.tripped is not None:
            raise ParseRejectionError(guard.tripped)
        for prog in q.recentProgress:
            row = (prog.get("observedMetrics") or {}).get("parse_guard")
            if row is None:
                continue
            d = row.asDict()  # observedMetrics values are Rows
            if (d.get("rows_rejected") or 0) > 0:
                raise ParseRejectionError(d)
    finally:
        spark.streams.removeListener(guard)


def run_error_aggregator(spark, args, experiments: bool = False):
    raw, streaming = _source(spark, args)
    if experiments:
        from telemetry_streaming_spark.jobs import experiments_error_aggregator as job

        agg = job.aggregate(raw, streaming=streaming)
        if args.explain:
            agg.explain("formatted")
            return
        _require(args, "output-path")
        if streaming:
            _require(args, "checkpoint-path")
            q = (
                agg.repartition(1).writeStream.queryName("main_query")
                .format("parquet").option("path", args.output_path)
                .option("checkpointLocation", args.checkpoint_path)
                .outputMode("append").start()
            )
            q.awaitTermination()
        else:
            agg.repartition(args.num_parquet_files).write.mode("overwrite").parquet(args.output_path)
        return
    from telemetry_streaming_spark.jobs import error_aggregator as job

    if args.explain:
        job.aggregate(raw, streaming=streaming).explain("formatted")
        return
    _require(args, "output-path")
    raise_on_error = getattr(args, "raise_on_error", False)
    if streaming:
        _require(args, "checkpoint-path")
        if raise_on_error:
            _await_stream_with_reject_guard(
                spark,
                lambda: job.write_streaming(
                    raw, args.output_path, args.checkpoint_path, raise_on_error=True
                ),
            )
        else:
            job.write_streaming(raw, args.output_path, args.checkpoint_path).awaitTermination()
    else:
        job.write_batch(
            raw, args.output_path, args.num_parquet_files, raise_on_error=raise_on_error
        )


def run_event_ping_events(spark, args):
    from telemetry_streaming_spark.jobs import event_ping_events as job

    raw, streaming = _source(spark, args)
    if args.explain:
        job.explode_events(raw).explain("formatted")
        return
    _require(args, "output-path")
    if streaming:
        _require(args, "checkpoint-path")
        job.write_streaming(raw, args.output_path, args.checkpoint_path).awaitTermination()
    else:
        job.explode_events(raw).write.mode("overwrite").parquet(args.output_path)


def run_experiment_enrollments(spark, args):
    from telemetry_streaming_spark.jobs import experiment_enrollments as job

    raw, streaming = _source(spark, args)
    agg = job.aggregate(raw, streaming=streaming)
    if args.explain:
        agg.explain("formatted")
        return
    _require(args, "output-path")
    if streaming:
        _require(args, "checkpoint-path")
        (
            agg.writeStream.queryName("main_query").format("parquet")
            .option("path", args.output_path)
            .option("checkpointLocation", args.checkpoint_path)
            .outputMode("append").start().awaitTermination()
        )
    else:
        agg.write.mode("overwrite").parquet(args.output_path)


def run_enrollments_to_testtube(spark, args):
    from telemetry_streaming_spark.jobs import enrollments_to_testtube as job

    raw, streaming = _source(spark, args)
    rows = job.to_json_rows(job.aggregate(raw, streaming=streaming))
    if args.explain:
        rows.explain("formatted")
        return
    if args.url:
        from telemetry_streaming_spark.sinks.http import TestTubeHttpSink, push_partitions

        push_partitions(rows, lambda: TestTubeHttpSink(args.url))
    else:
        _require(args, "output-path")
        _write_text(rows, rows.columns[0], args.output_path)


def run_uptake_to_datadog(spark, args):
    from telemetry_streaming_spark.jobs import uptake_to_datadog as job

    raw, streaming = _source(spark, args)
    raise_on_error = getattr(args, "raise_on_error", False)
    obs = None
    if raise_on_error:
        m, obs = job.metrics_guarded(raw, streaming=streaming)
    else:
        m = job.metrics(raw)
    if args.explain:
        m.explain("formatted")
        return
    if streaming:
        # The reference runs this job as a Kafka->DogStatsD stream
        # (UptakeEventsToDatadog.scala:103-118); foreach(writer) is the
        # ForeachWriter sink, parquet append is the offline fallback.
        _require(args, "checkpoint-path")

        def start():
            if args.statsd_host:
                from telemetry_streaming_spark.sinks.dogstatsd import DogStatsDMetricSink

                writer = m.writeStream.foreach(
                    DogStatsDMetricSink(args.statsd_host, args.statsd_port)
                )
            else:
                _require(args, "output-path")
                writer = m.writeStream.format("parquet").option("path", args.output_path)
            return (
                writer.queryName("uptake_to_datadog")
                .option("checkpointLocation", args.checkpoint_path)
                .outputMode("append")
                .start()
            )

        if raise_on_error:
            _await_stream_with_reject_guard(spark, start)
        else:
            start().awaitTermination()
        return
    if args.statsd_host:
        from telemetry_streaming_spark.sinks.dogstatsd import DogStatsDMetricSink

        host, port = args.statsd_host, args.statsd_port

        def push(rows):
            w = DogStatsDMetricSink(host, port)
            w.open(0, 0)
            try:
                for r in rows:
                    w.process(r)
            finally:
                w.close(None)

        m.foreachPartition(push)
    else:
        _require(args, "output-path")
        m.write.mode("overwrite").parquet(args.output_path)
    if obs is not None:
        from telemetry_streaming_spark.observability import (
            ParseRejectionError,
            observation_counts,
        )

        counts = observation_counts(obs, lambda: job.count_parse_failures(raw))
        if counts.get("rows_rejected"):
            raise ParseRejectionError(counts)


def run_crashes(spark, args, protocol: str):
    from telemetry_streaming_spark.jobs import crashes as job

    raw, _ = _source(spark, args)
    if protocol == "influx":
        lines = job.to_influx(raw, measurement_name=args.measurement)
        prefix, sep, suffix = "", "\n", ""
    else:
        lines = job.to_opentsdb(raw)
        prefix, sep, suffix = "[", ",", "]"
    if args.explain:
        lines.explain("formatted")
        return
    if args.url:
        from telemetry_streaming_spark.sinks.http import BatchHttpSink, push_partitions

        push_partitions(
            lines,
            lambda: BatchHttpSink(
                args.url, prefix=prefix, sep=sep, suffix=suffix,
                max_batch_size=args.max_batch_size,
            ),
            max_parallel_requests=args.max_parallel_requests,
        )
    else:
        _require(args, "output-path")
        _write_text(lines, lines.columns[0], args.output_path)


def run_events_to_amplitude(spark, args):
    from telemetry_streaming_spark.jobs import events_to_amplitude as job

    _require(args, "config")
    config = job.load_config(args.config)
    doctype, app_name = job.dispatch_for_config(config)
    raw, streaming = _source(spark, args)
    payloads = job.amplitude_payloads(
        raw, config, sample=args.sample, doctype=doctype, app_name=app_name
    )
    events = job.exploded_events(payloads)
    if args.explain:
        events.explain("formatted")
        return
    if args.url:
        from telemetry_streaming_spark.sinks.http import AmplitudeHttpSink

        url = args.url
        api_key = args.api_key or os.environ.get("AMPLITUDE_API_KEY", "")

        def push(df):
            df.select("event_json").foreachPartition(
                lambda rows: AmplitudeHttpSink(url, api_key).send_events(
                    [r.event_json for r in rows]
                )
            )

        if streaming:
            _require(args, "checkpoint-path")
            (
                events.writeStream.queryName("main_query")
                .option("checkpointLocation", args.checkpoint_path)
                .foreachBatch(lambda df, bid: push(df)).start().awaitTermination()
            )
        else:
            push(events)
    else:
        _require(args, "output-path")
        _write_text(events, events.columns[-1], args.output_path)


def run_federated_optimizer(spark, args):
    from telemetry_streaming_spark.jobs import federated_optimizer as job

    _require(args, "state-path", "model-output-path", "checkpoint-path")
    raw, streaming = _source(spark, args)
    if not streaming:
        raise SystemExit("federated_optimizer is a streaming-only job")
    updates = job.frecency_updates(raw, model_branch=args.model_branch)
    agg = job.aggregate_updates(updates, streaming=True)
    if args.explain:
        agg.explain("formatted")
        return
    sink = job.FederatedOptimizerSink(args.state_path, args.model_output_path)
    job.write_updates_streaming(agg, sink, args.checkpoint_path).awaitTermination()


def run_minhash_index(spark, args):
    """The nightly-admission dedup flow as an operable job
    (operators/dedup.py:incremental_minhash_dedup).

    --mode build: corpus documents parquet in -> persisted MinHash band
    index parquet out (partitioned by band; the table a deployment
    stores and appends to instead of re-banding the corpus nightly).

    --mode admit: batch documents + corpus documents + band index in;
    near-dups of the batch against the index are REJECTED, the rest
    written to --output-path; --update-index appends the admitted
    documents' bands so night N+1 probes them too.  Work is
    O(batch + candidates), never O(corpus).

    --mode admit --stream-input <dir>: continuous admission — a
    checkpointed file stream of document parquet; each micro-batch
    admits against the index as grown by every previous batch
    (requires --update-index to be meaningful across batches)."""
    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.dedup import (
        banded_signatures,
        incremental_minhash_dedup,
    )

    _require(args, "index-path")
    if args.mode == "build" or not args.stream_input:
        _require(args, "input-path")
        docs = spark.read.parquet(args.input_path)
    else:
        docs = None
    if args.mode == "build":
        bands = banded_signatures(docs, num_perm=args.num_perm, bands=args.bands)
        bands.write.mode("overwrite").partitionBy("band").parquet(args.index_path)
        print(f"index_bands: {spark.read.parquet(args.index_path).count()}")
        return
    _require(args, "corpus-path", "output-path")

    def admit_batch(batch_docs, epoch=None):
        """One admission round: probe the CURRENT index/corpus, write
        the survivors, grow the stores."""
        tag = f"epoch_{epoch}_" if epoch is not None else ""
        corpus = spark.read.parquet(args.corpus_path)
        index = spark.read.parquet(args.index_path)
        pairs = incremental_minhash_dedup(
            batch_docs,
            corpus,
            num_perm=args.num_perm,
            bands=args.bands,
            threshold=args.near_dup_threshold,
            corpus_bands=index,
        )
        dup_ids = pairs.select(F.col("batch_id").alias("doc_id")).distinct()
        admitted = batch_docs.join(dup_ids, "doc_id", "left_anti")
        # The night's near-dup PAIR drop for the `clusters` labeling
        # flow: a rejected doc is recorded against the corpus doc(s)
        # it duplicated, so labeling can fold it into that cluster
        # without re-resolving history.  Per-epoch overwrite keeps the
        # write idempotent on foreachBatch replay, and `clusters`
        # skips batch dirs its manifest already incorporated — the
        # handoff is idempotent from both sides.
        if getattr(args, "pairs_output", None):
            batch_name = getattr(args, "pairs_batch_name", None)
            if not batch_name:
                if epoch is not None:
                    # stream mode: the -epochN suffix below makes the
                    # default unique per micro-batch across restarts
                    # (the checkpoint never reuses an epoch id)
                    batch_name = "batch"
                else:
                    # batch mode: a constant default would make night
                    # N+1 silently overwrite night N's pairs subdir —
                    # and `clusters` skips batch dirs already in its
                    # manifest, so every night after the first would
                    # drop out of the labeling flow (r9 ADVICE).
                    # Derive the name from the FULL normalized input
                    # path (basename for readability + a path hash for
                    # uniqueness: /drops/01-01/docs and /drops/01-02/
                    # docs share a leaf but must not share a subdir —
                    # r10 review); a RERUN of the same drop still
                    # overwrites its own subdir (the idempotency the
                    # overwrite exists for).
                    import hashlib

                    norm = os.path.normpath(args.input_path)
                    base = os.path.basename(norm) or "batch"
                    digest = hashlib.md5(norm.encode()).hexdigest()[:8]
                    batch_name = f"batch-{base}-{digest}"
            if epoch is not None:
                batch_name = f"{batch_name}-epoch{epoch}"
            night_pairs = (
                pairs.where(F.col("batch_id") != F.col("corpus_id"))
                .select(
                    F.col("batch_id").cast("long").alias("id1"),
                    F.col("corpus_id").cast("long").alias("id2"),
                )
                .distinct()
            )
            pair_dir = os.path.join(args.pairs_output, batch_name)
            night_pairs.write.mode("overwrite").parquet(pair_dir)
            n_pair_rows = spark.read.parquet(pair_dir).count()
            print(f"{tag}pairs_written: {n_pair_rows}")
        if args.stream_input:
            # per-epoch overwrite: replaying a micro-batch after a
            # crash (foreachBatch is at-least-once) rewrites the same
            # subdir instead of appending duplicates
            out_dir = os.path.join(args.output_path, f"epoch={epoch}")
            admitted.write.mode("overwrite").parquet(out_dir)
            written = spark.read.parquet(out_dir)
        else:
            admitted.write.mode("overwrite").parquet(args.output_path)
            written = spark.read.parquet(args.output_path)
        if args.update_index:
            # bands/corpus run over the materialized ADMITTED rows
            # (a re-delivered already-admitted id is rejected above
            # and must not re-append its bands).  These appends are
            # at-least-once on replay; duplicate band/corpus rows are
            # cost, not correctness — candidate pairs collapse through
            # dup_ids.distinct() either way.
            banded_signatures(
                written, num_perm=args.num_perm, bands=args.bands
            ).write.mode("append").partitionBy("band").parquet(args.index_path)
            if args.stream_input:
                # continuous mode also grows the corpus text store so
                # the NEXT batch's candidate verification can read it
                written.write.mode("append").parquet(args.corpus_path)
        n_in = batch_docs.count()
        # count the materialized output, not n_in - dup_ids.count():
        # when a batch carries duplicate doc_ids, the left_anti join
        # drops MORE rows than distinct dup ids and the arithmetic
        # over-counts admissions
        n_adm = written.count()
        print(f"{tag}batch_docs: {n_in}")
        print(f"{tag}admitted: {n_adm}")
        print(f"{tag}rejected: {n_in - n_adm}")

    if args.stream_input:
        # Continuous admission: a checkpointed file stream of document
        # parquet dropped into the watched dir; each micro-batch
        # admits against the index AS GROWN by every previous batch
        # (foreachBatch — the probe is an index join, not stream
        # state).  availableNow drains what is present and stops, so
        # the job runs as a checkpointed periodic drain: re-invoking
        # processes only files the checkpoint has not seen.
        _require(args, "checkpoint-path")
        schema = spark.read.parquet(args.corpus_path).schema
        stream = (
            spark.readStream.schema(schema)
            # one file per micro-batch: the admission contract is that
            # each batch probes the index AS GROWN by every previous
            # one; a multi-file mega-batch would admit mutual
            # near-dups across files (batch-vs-batch is out of scope
            # for the incremental prober)
            .option("maxFilesPerTrigger", str(args.max_files_per_trigger))
            .parquet(args.stream_input)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, epoch: admit_batch(b, epoch)
            )
            .option("checkpointLocation", args.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return
    admit_batch(docs)


def run_ann_index(spark, args):
    """Persisted IVF approximate-nearest-neighbor index
    (operators/similarity.py:ivf_centroids/cosine_topk_ivf_index).

    --mode build: embeddings parquet in -> <index>/assignments parquet
    PARTITIONED BY ivf_cluster + <index>/centroids parquet out.  The
    cluster partitioning is the scale lever: a query batch probing
    nprobe of nlist lists dynamic-partition-prunes the scan to
    ~nprobe/nlist of the corpus files.

    --mode query: queries parquet (query_id, query_vec) + index in ->
    top-k neighbors parquet out.

    --pq-m M at build time adds the compressed tier (IVF-PQ): PQ codes
    ride alongside each assignment row and the codebooks persist next
    to the centroids; ``--use-pq`` at query time scores the probed
    clusters by ADC lookup (m array reads per candidate) instead of
    the dim-wide exact cosine — the float vector column is never read.
    ADC ranks by squared L2 (monotone in cosine for normalized
    embeddings)."""
    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.similarity import (
        cosine_topk_ivf_index,
        ivf_assign,
        ivf_centroids,
    )

    _require(args, "input-path", "index-path")
    if args.mode == "build":
        emb = spark.read.parquet(args.input_path)
        centroids = ivf_centroids(
            emb, nlist=args.nlist, iters=args.iters,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        if not centroids:
            raise SystemExit("empty embeddings input — nothing to index")
        assigned = ivf_assign(emb, centroids, args.vec_col)
        cbs = None
        if args.pq_m:
            from telemetry_streaming_spark.operators.pq import pq_encode, pq_train

            cbs = pq_train(
                emb, vec_col=args.vec_col, id_col=args.id_col,
                m=args.pq_m, k=args.pq_k, iters=args.iters,
            )
            assigned = pq_encode(assigned, cbs, vec_col=args.vec_col)
        if args.explain:
            # centroid/codebook training above already ran (it IS
            # collection by nature); the explain covers the write-side
            # plan and must leave the persisted index UNTOUCHED — the
            # codebooks write happens below, with the other writes
            assigned.explain("formatted")
            return
        if cbs is not None:
            cb_rows = [
                (j, c, [float(x) for x in cent])
                for j, cb in enumerate(cbs)
                for c, cent in enumerate(cb)
            ]
            spark.createDataFrame(
                cb_rows, "subspace int, code int, centroid array<double>"
            ).repartition(1).write.mode("overwrite").parquet(
                os.path.join(args.index_path, "codebooks")
            )
        assigned.write.mode("overwrite").partitionBy(
            "ivf_cluster"
        ).parquet(os.path.join(args.index_path, "assignments"))
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "ivf_cluster int, centroid array<double>",
        ).repartition(1).write.mode("overwrite").parquet(
            os.path.join(args.index_path, "centroids")
        )
        print(f"clusters: {len(centroids)}")
        print(f"indexed: {spark.read.parquet(os.path.join(args.index_path, 'assignments')).count()}")
        return
    _require(args, "output-path")
    index = spark.read.parquet(os.path.join(args.index_path, "assignments"))
    cent_rows = (
        spark.read.parquet(os.path.join(args.index_path, "centroids"))
        .orderBy("ivf_cluster")
        .collect()
    )
    centroids = [[float(x) for x in r["centroid"]] for r in cent_rows]
    queries = spark.read.parquet(args.input_path)
    if args.use_pq:
        import numpy as np
        from pyspark.sql import Window
        from pyspark.sql.types import (
            ArrayType, DoubleType, IntegerType, StructField, StructType,
        )

        cb_rows = spark.read.parquet(
            os.path.join(args.index_path, "codebooks")
        ).orderBy("subspace", "code").collect()
        m = 1 + max(r["subspace"] for r in cb_rows)
        kq = 1 + max(r["code"] for r in cb_rows)
        cbs = np.zeros((m, kq, len(cb_rows[0]["centroid"])))
        for r in cb_rows:
            cbs[r["subspace"], r["code"]] = r["centroid"]
        d_sub = cbs.shape[2]
        cmat = np.asarray(centroids)
        # ONE index scan for the whole batch (the exact tier's shape):
        # each query's m x k ADC lookup table + probed-cluster set ride
        # in a broadcast side table; the probe union gives the static
        # partition filter, per-query membership is array_contains, and
        # the score folds each candidate's codes through ITS query's
        # LUT column.  Output contract matches the exact tier
        # (query_id/neighbor_id/rank, self excluded), adc_dist in place
        # of cos.
        qrows = queries.collect()  # bounded: same contract as exact tier
        side = []
        union_probe = set()
        for qr in qrows:
            qv = np.asarray(list(qr["query_vec"]), dtype=np.float64)
            sims = (cmat @ qv) / (
                np.linalg.norm(cmat, axis=1) * (np.linalg.norm(qv) or 1.0)
            )
            probe = [int(p) for p in np.argsort(-sims)[: args.nprobe]]
            union_probe.update(probe)
            lut = [
                [float(((cbs[j, c] - qv[j * d_sub:(j + 1) * d_sub]) ** 2).sum())
                 for c in range(kq)]
                for j in range(m)
            ]
            side.append((qr["query_id"], probe, lut))
        qid_type = queries.schema["query_id"].dataType
        side_schema = StructType([
            StructField("query_id", qid_type),
            StructField("__probe", ArrayType(IntegerType())),
            StructField("__lut", ArrayType(ArrayType(DoubleType()))),
        ])
        side_df = spark.createDataFrame(side, side_schema)
        if qrows:
            cand = index.where(
                F.col("ivf_cluster").isin(sorted(union_probe))
            ).where(F.col("pq_codes").isNotNull())
            scored = (
                cand.crossJoin(F.broadcast(side_df))
                .where(
                    F.array_contains(F.col("__probe"), F.col("ivf_cluster"))
                    & (F.col(args.id_col) != F.col("query_id"))
                )
                .select(
                    "query_id",
                    F.col(args.id_col).alias("neighbor_id"),
                    F.aggregate(
                        F.transform(
                            F.col("pq_codes"),
                            lambda c, i: F.element_at(
                                F.element_at(F.col("__lut"), i + 1), c + 1
                            ),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("adc_dist"),
                )
            )
            topk = (
                scored.withColumn(
                    "rank",
                    F.row_number().over(
                        Window.partitionBy("query_id").orderBy(
                            "adc_dist", "neighbor_id"
                        )
                    ),
                )
                .where(F.col("rank") <= args.k)
            )
        else:  # empty query batch: empty result, id types from the inputs
            topk = spark.createDataFrame(
                [],
                StructType([
                    StructField("query_id", qid_type),
                    StructField("neighbor_id", index.schema[args.id_col].dataType),
                    StructField("adc_dist", DoubleType()),
                    StructField("rank", IntegerType()),
                ]),
            )
    else:
        topk = cosine_topk_ivf_index(
            index, centroids, queries, k=args.k, nprobe=args.nprobe,
            id_col=args.id_col, vec_col=args.vec_col,
        )
    if args.explain:
        # note: the probed-cluster prefilter is computed eagerly (one
        # small job over the query batch) so the printed plan shows the
        # real static partition filter the run would use
        topk.explain("formatted")
        return
    topk.write.mode("overwrite").parquet(args.output_path)
    print(f"queries: {queries.count()}")
    print(f"results: {spark.read.parquet(args.output_path).count()}")


def _index_content_stats(spark, path: str) -> tuple[int, int]:
    """Order-independent content fingerprint of a parquet dir: row
    count + sum of per-row xxhash64 over all columns (sorted by name).
    Two dirs with the same fingerprint hold the same multiset of rows
    regardless of file layout — the equivalence compaction must
    preserve."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a BIGINT sum of int64 hashes
        # overflows (ANSI mode raises) after a handful of rows
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _recover_index_swap(index_path: str) -> None:
    """Complete or roll back an atomic-swap interrupted by a crash.

    The swap sequence (run only AFTER staging content is verified) is
    rename(live -> .old), rename(.staging -> live), rmtree(.old); a
    crash leaves exactly one recoverable state: live missing with a
    verified .staging (finish the second rename) or stale .old/.staging
    beside a healthy live (delete them — .staging is only unverified
    when live still exists)."""
    import shutil

    staging, old = index_path + ".staging", index_path + ".old"
    if not os.path.isdir(index_path):
        if os.path.isdir(staging):
            os.rename(staging, index_path)
        elif os.path.isdir(old):
            os.rename(old, index_path)
        else:
            raise SystemExit(
                f"index missing with nothing to recover: {index_path}"
            )
    for d in (staging, old):
        if os.path.isdir(d):
            shutil.rmtree(d)


def run_maintain(spark, args):
    """Nightly index maintenance in ONE idempotent invocation:
    admit -> compact -> re-probe-verify over the persisted MinHash
    band index.

    1. **admit**: drain the watched dir through the checkpointed
       availableNow stream (run_minhash_index admit semantics with
       --update-index); replayed micro-batches rewrite their epoch
       subdir, so a crash-rerun never duplicates output rows.  With
       ``--pairs-output`` each batch also drops its (id1, id2)
       near-dup pairs as a batch subdir — the handoff that makes
       ``maintain`` -> ``clusters`` one nightly sequence (r8 verdict
       item 6).
    2. **compact**: the nightly band appends accumulate small files;
       rewrite the index into ~--target-file-mb files clustered by
       band (band_key-sorted within files for row-group skipping on
       the probe join).  Crash-safe: write to <index>.staging, verify
       the content fingerprint matches the live index EXACTLY, only
       then swap via two renames; _recover_index_swap completes or
       discards an interrupted swap on the next invocation, so a kill
       anywhere leaves a rerun producing a content-identical index.
    3. **verify**: re-probe every admitted document against the
       compacted index — each must rediscover ITSELF (its bands were
       appended in step 1), proving the compacted index still serves
       admission.  A shortfall exits non-zero before any downstream
       consumer trusts the index.

    Mirrors the reference's restart-recovery discipline for stateful
    sinks (FederatedLearningSearchOptimizerS3Sink.scala:104-145):
    every stage is either checkpointed, staged-then-swapped, or
    read-only."""
    import shutil

    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    _require(
        args,
        "index-path",
        "corpus-path",
        "output-path",
        "stream-input",
        "checkpoint-path",
    )
    if args.target_file_mb <= 0:
        raise SystemExit("--target-file-mb must be positive")

    # stage 0: a previous invocation may have died mid-swap
    _recover_index_swap(args.index_path)

    # stage 1: admit (checkpointed drain; idempotent on replay)
    args.mode = "admit"
    args.update_index = True
    run_minhash_index(spark, args)

    # stage 2: compact behind a verified staging dir + atomic swap
    n_live, h_live = _index_content_stats(spark, args.index_path)
    total = 0
    for root, _dirs, files in os.walk(args.index_path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // (args.target_file_mb * 1024 * 1024)))
    staging = args.index_path + ".staging"
    # range-partition on (band, band_key): hashing band alone lands
    # everything in <= `bands` non-empty partitions (~1 file per band
    # regardless of --target-file-mb); ranging on the composite key
    # honors the file sizing AND keeps each file a contiguous
    # band_key range for row-group skipping on the probe join
    (
        spark.read.parquet(args.index_path)
        .repartitionByRange(int(n_files), F.col("band"), F.col("band_key"))
        .sortWithinPartitions("band_key", "doc_id")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(staging)
    )
    n_stag, h_stag = _index_content_stats(spark, staging)
    if (n_stag, h_stag) != (n_live, h_live):
        shutil.rmtree(staging)
        raise SystemExit(
            f"compaction changed index content "
            f"(rows {n_live}->{n_stag}, hash {h_live}->{h_stag}); "
            "live index left untouched"
        )
    os.rename(args.index_path, args.index_path + ".old")
    os.rename(staging, args.index_path)
    shutil.rmtree(args.index_path + ".old")

    # stage 3: re-probe — every admitted doc must find itself in the
    # compacted index (read-only; rerun-safe).  A first run over an
    # empty watched dir admits nothing and writes no output dir at
    # all — that is a clean no-op, not a failure.
    if os.path.isdir(args.output_path):
        admitted = spark.read.parquet(args.output_path)
        # Only docs that actually produce bands can rediscover
        # themselves: a legitimate short document (< shingle width
        # tokens) emits no signature row (minhash_signatures
        # contract), is admitted with no candidates, and must not
        # fail every subsequent maintain run.  Count the probe target
        # over banded docs only; report the short tail separately.
        from telemetry_streaming_spark.operators.dedup import banded_signatures

        n_adm_total = admitted.select("doc_id").distinct().count()
        bandable_ids = (
            banded_signatures(
                admitted, num_perm=args.num_perm, bands=args.bands
            )
            .select("doc_id")
            .distinct()
        )
        n_adm = bandable_ids.count()
    else:
        n_adm_total = 0
        n_adm = 0
    n_found = 0
    if n_adm:
        pairs = incremental_minhash_dedup(
            admitted,
            spark.read.parquet(args.corpus_path),
            num_perm=args.num_perm,
            bands=args.bands,
            threshold=args.near_dup_threshold,
            corpus_bands=spark.read.parquet(args.index_path),
        )
        n_found = (
            pairs.where(F.col("batch_id") == F.col("corpus_id"))
            .select("batch_id")
            .distinct()
            .count()
        )
    print(f"maintain_index_rows: {n_stag}")
    print(f"maintain_index_files: {int(n_files)}")
    print(f"maintain_admitted_total: {n_adm_total}")
    print(f"maintain_admitted_banded: {n_adm}")
    print(f"maintain_admitted_short: {n_adm_total - n_adm}")
    print(f"maintain_reprobe_found: {n_found}")
    if n_found != n_adm:
        raise SystemExit(
            f"re-probe verification failed: {n_found} of {n_adm} admitted "
            "documents rediscover themselves in the compacted index"
        )


def run_clusters(spark, args):
    """Nightly duplicate-CLUSTER maintenance — the labeling half of the
    incremental dedup story (r7 verdict item 3): ``maintain`` decides
    which documents enter via the band index; this persists the
    ``(id, component)`` labeling and folds each night's new near-dup
    pair batches into it via ``incremental_components`` (set-identical
    to a from-scratch ``connected_components`` over all pairs — the
    ``incremental_dedup_components`` registry oracle states exactly
    those semantics), so cluster resolution stays O(labels + new pairs)
    per night instead of re-resolving history.

    Layout: ``--pairs-input`` is a dir of batch-named parquet subdirs
    (one per nightly drop, (id1, id2) pairs); ``--labels-path`` is the
    persisted labeling parquet dir, carrying ``_manifest.json``
    (processed batch names) INSIDE it so the atomic swap moves labels
    and manifest together — there is no crash window where one moved
    without the other.

    Restart discipline (the ``maintain`` swap discipline):

    0. recover an interrupted swap (``_recover_index_swap``);
    1. list batches the manifest has not seen;
    2. resolve ``incremental_components(live labels, new pairs)``;
    3. write ``<labels>.staging`` (labels + updated manifest);
    4. verify ON STAGING before anything moves: every new pair's two
       endpoints must resolve to the SAME component (the cluster
       analog of maintain's "every admitted doc rediscovers itself"),
       and every previously-labeled id must still be labeled; a
       shortfall removes staging and exits non-zero with live
       untouched;
    5. swap via two renames + rmtree.

    Idempotent at every boundary: a kill before the swap leaves live +
    manifest unchanged (rerun redoes the night); a kill mid-swap is
    completed or rolled back by step 0; reprocessing an
    already-incorporated batch is a semantic no-op (folding a pair
    whose endpoints already share a component changes nothing).
    """
    import json as _json
    import shutil

    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.components import (
        incremental_components,
    )

    _require(args, "pairs-input", "labels-path")
    labels_path = args.labels_path
    manifest_name = "_manifest.json"

    # stage 0: a previous invocation may have died mid-swap.  Differs
    # from _recover_index_swap in ONE state: live missing + staging
    # present + no .old is a FIRST-RUN crash before the verify/swap
    # (the index flow can never hit it because `build` creates live
    # first), so the unverified staging is discarded and the run
    # redone, never promoted.
    staging_dir, old_dir = labels_path + ".staging", labels_path + ".old"
    if not os.path.isdir(labels_path):
        if os.path.isdir(old_dir) and os.path.isdir(staging_dir):
            # crash between the two swap renames: staging was verified
            os.rename(staging_dir, labels_path)
        elif os.path.isdir(old_dir):
            os.rename(old_dir, labels_path)  # defensive: restore live
        elif os.path.isdir(staging_dir):
            shutil.rmtree(staging_dir)  # unverified first-run staging
    for d in (staging_dir, old_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)

    done: set[str] = set()
    live_exists = os.path.isdir(labels_path)
    if live_exists:
        manifest_path = os.path.join(labels_path, manifest_name)
        if os.path.exists(manifest_path):
            done = set(_json.loads(open(manifest_path).read())["batches"])
    batches = sorted(
        d
        for d in os.listdir(args.pairs_input)
        if os.path.isdir(os.path.join(args.pairs_input, d))
        and not d.startswith(("_", "."))
    )
    todo = [b for b in batches if b not in done]
    print(f"clusters_batches_total: {len(batches)}")
    print(f"clusters_batches_processed: {len(todo)}")
    if not todo:
        n = (
            spark.read.parquet(labels_path).count() if live_exists else 0
        )
        print(f"clusters_labels_total: {n}")
        return

    if live_exists:
        labels = spark.read.parquet(labels_path).select("id", "component")
    else:
        labels = spark.createDataFrame([], "id long, component long")
    new_pairs = spark.read.parquet(
        *[os.path.join(args.pairs_input, b) for b in todo]
    ).select(
        F.col(args.id1_col).cast("long").alias("id1"),
        F.col(args.id2_col).cast("long").alias("id2"),
    )
    n_pairs = new_pairs.count()
    print(f"clusters_new_pairs: {n_pairs}")

    resolved = incremental_components(labels, new_pairs)

    # stage 3: staging (labels + the updated manifest inside it)
    staging = labels_path + ".staging"
    resolved.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, manifest_name), "w") as f:
        f.write(_json.dumps({"batches": sorted(done | set(todo))}))

    # stage 4: verify ON STAGING — same-cluster re-probe + coverage
    staged = spark.read.parquet(staging).select("id", "component")
    comp_a = staged.select(
        F.col("id").alias("id1"), F.col("component").alias("__c1")
    )
    comp_b = staged.select(
        F.col("id").alias("id2"), F.col("component").alias("__c2")
    )
    probe = (
        new_pairs.where(F.col("id1") != F.col("id2"))
        .join(comp_a, "id1", "left")
        .join(comp_b, "id2", "left")
        .select(
            (
                F.coalesce(F.col("__c1"), F.col("id1"))
                == F.coalesce(F.col("__c2"), F.col("id2"))
            ).alias("__same")
        )
    )
    n_bad = probe.where(~F.col("__same")).count()
    n_lost = (
        labels.join(staged.select("id"), "id", "left_anti").count()
        if live_exists
        else 0
    )
    if n_bad or n_lost:
        shutil.rmtree(staging)
        raise SystemExit(
            f"cluster verification failed on staging: {n_bad} new pairs "
            f"split across components, {n_lost} previously-labeled ids "
            "lost; live labeling left untouched"
        )
    n_labels = staged.count()

    # stage 5: atomic swap
    if live_exists:
        os.rename(labels_path, labels_path + ".old")
    os.rename(staging, labels_path)
    if os.path.isdir(labels_path + ".old"):
        shutil.rmtree(labels_path + ".old")
    print(f"clusters_labels_total: {n_labels}")


def run_rollup(spark, args):
    """Incremental materialized rollup with a crash-safe manifest —
    the reference's daily batch aggregation (``--from/--to`` over
    date-named S3 subdirs, ErrorAggregatorBase.scala:280-300) run as a
    self-maintaining materialized view: each invocation aggregates
    ONLY the input date directories the manifest has not seen and
    appends them as ``date=<d>`` partitions of the rollup.

    Idempotent restart without staging: the per-date aggregate is
    deterministic and written with dynamic overwrite of exactly its
    own partition, and the manifest (``_manifest.json`` — the
    underscore keeps Spark's readers from treating it as data) is
    replaced atomically AFTER each date commits.  A crash mid-write
    leaves the date out of the manifest, so the rerun overwrites the
    same partition with the same bytes-equivalent rows; a crash after
    the write but before the manifest update does the same.  At 100 TB
    this is the cheap nightly path: touched partitions only, never a
    full recompute.

    Aggregate grain: ``--group-by`` columns, row count, and an exact
    integer-cents sum of ``--sum-col`` (the windowed_sum convention).
    Optional mergeable-sketch tiers ride the same per-date partitions:
    ``--distinct-col`` persists an HLL sketch (union report =
    cross-date distinct estimate) and ``--quantile-col`` a KLL doubles
    sketch (merge report = cross-date p50/p95/p99) — both reports read
    sketch BINARIES only, never the raw history, so "distribution of
    value over all time" stays O(dates × groups) at 100 TB.
    """
    import json as _json

    from pyspark.sql import functions as F

    _require(args, "input-path", "output-path", "group-by")
    manifest_path = os.path.join(args.output_path, "_manifest.json")
    # the aggregate schema this invocation will write; persisted in
    # the manifest so a re-invocation with different flags (e.g.
    # --distinct-col added later) cannot silently mix heterogeneous
    # date partitions that spark.read would then mis-unify
    schema_cols = args.group_by.split(",") + ["n_rows"]
    if args.sum_col:
        schema_cols.append(f"sum_{args.sum_col}_cents")
    if args.distinct_col:
        schema_cols.append(f"{args.distinct_col}_hll")
    if getattr(args, "quantile_col", None):
        schema_cols.append(f"{args.quantile_col}_kll")
    done: set[str] = set()
    if os.path.exists(manifest_path):
        manifest = _json.loads(open(manifest_path).read())
        done = set(manifest["dates"])
        prev_cols = manifest.get("columns")
        if prev_cols is None and done:
            # legacy manifest predating the 'columns' key: one flag
            # change could still silently mix heterogeneous date
            # partitions (r7 ADVICE) — infer the committed schema from
            # one partition instead of skipping the guard.  Partitions
            # are written in schema_cols order by this same code path,
            # so exact list equality below stays valid.
            probe = os.path.join(args.output_path, f"date={sorted(done)[0]}")
            prev_cols = spark.read.parquet(probe).columns
        if prev_cols is not None and prev_cols != schema_cols and done:
            raise SystemExit(
                "rollup schema mismatch: existing partitions carry "
                f"columns {prev_cols} but this invocation would write "
                f"{schema_cols}; rerun with matching flags or rebuild "
                "the rollup from scratch"
            )
    dates = sorted(
        d
        for d in os.listdir(args.input_path)
        if os.path.isdir(os.path.join(args.input_path, d)) and not d.startswith(("_", "."))
    )
    todo = [d for d in dates if d not in done]
    group_cols = args.group_by.split(",")
    os.makedirs(args.output_path, exist_ok=True)
    for d in todo:
        df = spark.read.parquet(os.path.join(args.input_path, d))
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        if args.sum_col:
            aggs.append(
                F.sum(
                    F.floor(F.col(args.sum_col) * 100 + F.lit(0.5)).cast("long")
                )
                .cast("long")
                .alias(f"sum_{args.sum_col}_cents")
            )
        if args.distinct_col:
            # mergeable datasketches HLL: the per-date sketch persists
            # beside the counts, so cross-date distinct users never
            # rescan history — union the binaries (below / downstream)
            aggs.append(
                F.hll_sketch_agg(args.distinct_col).alias(
                    f"{args.distinct_col}_hll"
                )
            )
        if getattr(args, "quantile_col", None):
            # mergeable datasketches KLL: per-date quantile sketches —
            # cross-date medians/p95/p99 merge from the binaries, so
            # the distribution report never rescans history either
            aggs.append(
                F.kll_sketch_agg_double(
                    F.col(args.quantile_col).cast("double")
                ).alias(f"{args.quantile_col}_kll")
            )
        agg = df.groupBy(*group_cols).agg(*aggs)
        agg.write.mode("overwrite").parquet(
            os.path.join(args.output_path, f"date={d}")
        )
        done.add(d)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(_json.dumps({"dates": sorted(done), "columns": schema_cols}))
        os.replace(tmp, manifest_path)  # atomic commit per date
    print(f"rollup_dates_total: {len(dates)}")
    print(f"rollup_dates_processed: {len(todo)}")
    print(f"rollup_dates_skipped: {len(dates) - len(todo)}")
    if args.distinct_col and (todo or args.report_distinct) and done:
        # lossless union of the persisted per-date sketches: the
        # incremental path to "distinct users all-time / per group"
        # — reads sketch binaries only, never the raw history
        col = f"{args.distinct_col}_hll"
        roll = spark.read.parquet(args.output_path)
        report = (
            roll.groupBy(*group_cols)
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg(F.col(col)))
                .cast("long")
                .alias("distinct_est")
            )
            .orderBy(*group_cols)
        )
        for r in report.collect():  # bounded: one row per group
            key = ",".join(str(r[c]) for c in group_cols)
            print(f"rollup_distinct[{key}]: {r['distinct_est']}")
    if (
        getattr(args, "quantile_col", None)
        and (todo or getattr(args, "report_quantiles", False))
        and done
    ):
        # lossless-merge of the persisted per-date KLL sketches: the
        # incremental path to "p50/p95/p99 all-time / per group" —
        # reads sketch binaries only, never the raw history
        col = f"{args.quantile_col}_kll"
        roll = spark.read.parquet(args.output_path)
        qs = F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double(F.col(col)),
            F.lit([0.5, 0.95, 0.99]),
        )
        report = (
            roll.groupBy(*group_cols)
            .agg(qs.alias("q"))
            .select(
                *group_cols,
                F.col("q")[0].alias("p50"),
                F.col("q")[1].alias("p95"),
                F.col("q")[2].alias("p99"),
            )
            .orderBy(*group_cols)
        )
        for r in report.collect():  # bounded: one row per group
            key = ",".join(str(r[c]) for c in group_cols)
            print(
                f"rollup_quantiles[{key}]: "
                f"p50={r['p50']} p95={r['p95']} p99={r['p99']}"
            )


def run_urlcap(spark, args):
    """URL hygiene pre-pass over a crawl parquet
    (operators/urls.py:url_dedup_cap): canonicalize --url-col,
    collapse canonical duplicates (MIN --id-col survives, duplicate
    count kept as evidence), cap each registrable domain at --cap
    pages, write survivors to --output-path.  --profile-path also
    writes the per-domain hygiene report (host_profile) the next
    run's --cap should be sized from.  Runs FIRST in a crawl
    pipeline: it reads only (id, url) columns, so column pruning
    keeps it scan-light even over a body-carrying table.

    --stream-input <dir>: continuous FRONTIER admission — a
    checkpointed availableNow drain of (id, url) parquet drops.  Each
    micro-batch canonicalizes, drops canonical pages the persisted
    store (--output-path) already admitted (one left-anti equi-join
    on canon_url — O(batch + store-probe), never O(store) rewrites),
    and admits new pages only while their domain is under --cap
    (batch ranks via per_group_cap, offset by the store's current
    per-domain counts).  Appends are at-least-once on foreachBatch
    replay: a replayed batch's already-appended canons anti-join away,
    and a crash-duplicated canon row costs storage, not correctness —
    every count here reads DISTINCT (domain, canon_url)."""
    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.urls import (
        host_profile,
        url_dedup_cap,
        with_url_columns,
    )

    _require(args, "output-path")
    if args.cap <= 0:
        raise SystemExit("--cap must be positive")
    if getattr(args, "stream_input", None):
        from telemetry_streaming_spark.operators.sampling import per_group_cap

        _require(args, "checkpoint-path")
        store_dir = args.output_path

        def _store(cols):
            # probe THROUGH Spark, not the local filesystem: an
            # os.listdir probe silently reads remote stores (s3a://,
            # hdfs://) as empty, which would disable cross-batch dedup
            # and reset every night's cap budget (r10 review)
            from pyspark.errors import AnalysisException

            try:
                # a missing path or a dir with no parquet raises at
                # read/analysis time; no action needed to probe
                return spark.read.parquet(store_dir).select(*cols)
            except AnalysisException:
                return None

        def admit(batch, epoch):
            canon = with_url_columns(
                batch.select(args.id_col, args.url_col), args.url_col
            ).where(
                F.col("canon_url").isNotNull() & (F.col("canon_url") != "")
            )
            uniq = canon.groupBy("domain", "canon_url").agg(
                F.min(F.col(args.id_col)).cast("long").alias(args.id_col)
            )
            store = _store(["domain", "canon_url"])
            if store is not None:
                uniq = uniq.join(
                    store.select("canon_url").distinct(),
                    "canon_url",
                    "left_anti",
                )
                counts = (
                    store.distinct()
                    .groupBy("domain")
                    .agg(F.count(F.lit(1)).cast("long").alias("__have"))
                )
            else:
                counts = None
            ranked = per_group_cap(
                uniq, "domain", "canon_url", cap=args.cap, keep_rank=True
            )
            if counts is not None:
                ranked = ranked.join(counts, "domain", "left").withColumn(
                    "__have", F.coalesce(F.col("__have"), F.lit(0))
                )
            else:
                ranked = ranked.withColumn("__have", F.lit(0))
            admitted = ranked.where(
                F.col("__rk") + F.col("__have") <= args.cap
            ).select("domain", "canon_url", args.id_col)
            # progress reads the BATCH, never the store: a per-epoch
            # full-store distinct().count() would make one drain
            # quadratic in total admitted pages (r10 review) — persist
            # so count + write execute the admission plan once
            admitted.persist()
            n_adm = admitted.count()
            admitted.write.mode("append").parquet(store_dir)
            admitted.unpersist()
            print(f"epoch_{epoch}_admitted: {n_adm}")

        # drops may arrive as parquet FILES or parquet DIRECTORIES —
        # infer the schema recursively and stream on a one-level glob
        # so both shapes are picked up.  A provisioned-but-empty watch
        # dir is a clean no-op drain, not a crash (r10 review).
        from pyspark.errors import AnalysisException

        try:
            schema = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(args.stream_input)
                .schema
            )
        except AnalysisException:
            print("urlcap: no parquet under --stream-input yet; nothing to drain")
            return
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(args.max_files_per_trigger))
            .parquet(os.path.join(args.stream_input, "*"))
        )
        q = (
            stream.writeStream.foreachBatch(admit)
            .option("checkpointLocation", args.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return

    _require(args, "input-path")
    df = spark.read.parquet(args.input_path)
    for col in (args.url_col, args.id_col):
        if col not in df.columns:
            raise SystemExit(
                f"column {col!r} not in input (has: {df.columns})"
            )
    survivors = url_dedup_cap(
        df.select(args.id_col, args.url_col), args.url_col, args.id_col,
        cap=args.cap,
    )
    survivors.write.mode("overwrite").parquet(args.output_path)
    n_out = spark.read.parquet(args.output_path).count()
    print(f"urlcap_survivors: {n_out}")
    if getattr(args, "profile_path", None):
        prof = host_profile(df.select(args.id_col, args.url_col), args.url_col)
        prof.write.mode("overwrite").parquet(args.profile_path)
        print(f"urlcap_domains: {spark.read.parquet(args.profile_path).count()}")


def run_compact(spark, args):
    """Small-files compaction: rewrite a parquet dir into
    ~--target-file-mb files (sized from the actual on-disk bytes, so
    a directory of ten thousand kilobyte files becomes a handful of
    scan-friendly ones).  --sort-by clusters rows within each output
    file (sortWithinPartitions — per-file sort, no global exchange)
    for row-group min/max skipping on those columns."""
    _require(args, "input-path", "output-path")
    if args.target_file_mb <= 0:
        raise SystemExit("--target-file-mb must be positive")
    total = 0
    for root, _dirs, files in os.walk(args.input_path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    if total == 0:
        # sizing walks the LOCAL filesystem; a remote path (s3a://,
        # hdfs://) or empty dir would silently compact to one file
        raise SystemExit(
            f"no local parquet bytes found under {args.input_path!r} — "
            "compact sizes output from local file sizes; for remote "
            "stores run it where the data is mounted"
        )
    n_files = max(1, -(-total // (args.target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(args.input_path)
    if getattr(args, "zorder_by", None):
        if args.sort_by:
            raise SystemExit("--sort-by and --zorder-by are mutually exclusive")
        from pyspark.sql import functions as F

        from telemetry_streaming_spark.functions.zorder import with_zorder_key

        # Morton-cluster: contiguous z-key ranges per file tighten the
        # per-file min/max of EVERY interleaved column, so conjunctive
        # filters prune files multiplicatively (single-column sort only
        # bounds its own column)
        keyed = with_zorder_key(df, args.zorder_by.split(","))
        out = (
            keyed.repartitionByRange(int(n_files), F.col("__zkey"))
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartition(int(n_files))
        if args.sort_by:
            out = out.sortWithinPartitions(*args.sort_by.split(","))
    out.write.mode("overwrite").parquet(args.output_path)
    written = [
        f for root, _d, fs in os.walk(args.output_path)
        for f in fs if f.endswith(".parquet")
    ]
    print(f"input_bytes: {total}")
    print(f"output_files: {len(written)}")


def run_report(spark, args):
    """Dataset card in one command: per-source sizes, token stats,
    length quantiles, trigram diversity, duplicated-span coverage, and
    cross-source exact-dup leakage over a documents parquet — the
    go/no-go audit before an export ships.  One JSON object to stdout
    (and --output-path)."""
    import json as _json

    from pyspark.sql import functions as F

    from telemetry_streaming_spark.functions.text import token_count
    from telemetry_streaming_spark.operators.contamination import dup_span_stats

    _require(args, "input-path")
    docs = spark.read.parquet(args.input_path)
    has_source = "source" in docs.columns
    src = F.col("source") if has_source else F.lit("all")
    n_tok = token_count(F.col("text"))
    per_source_rows = (
        docs.groupBy(src.alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).cast("long").alias("n_tokens"),
            F.percentile(n_tok, F.lit(0.5)).alias("p50_tokens"),
            F.percentile(n_tok, F.lit(0.99)).alias("p99_tokens"),
        )
        .collect()
    )
    leakage = (
        docs.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.countDistinct(src).alias("ns"), F.count(F.lit(1)).alias("nd"))
        .where(F.col("ns") > 1)
        .agg(F.count(F.lit(1)), F.coalesce(F.sum("nd"), F.lit(0)))
        .first()
    )
    spans = dup_span_stats(
        docs.select("doc_id", "text", src.alias("source")),
        n=args.span_ngram,
    ).collect()
    report = {
        # NULL-text sources aggregate to NULL sums/percentiles —
        # report them as zeros instead of dying on the bad source
        "n_docs": int(sum(r["n_docs"] for r in per_source_rows)),
        "n_tokens": int(sum(r["n_tokens"] or 0 for r in per_source_rows)),
        "per_source": {
            str(r["source"]): {
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"] or 0),
                "p50_tokens": float(r["p50_tokens"] or 0.0),
                "p99_tokens": float(r["p99_tokens"] or 0.0),
            }
            for r in per_source_rows
        },
        "cross_source_leakage": {
            "dup_groups": int(leakage[0]),
            "docs_involved": int(leakage[1]),
        },
        "duplicated_spans": {
            str(r["source"]): {
                "affected_docs": int(r["affected_docs"]),
                "covered_tokens": int(r["covered_tokens"]),
                "total_tokens": int(r["total_tokens"]),
            }
            for r in spans
        },
    }
    out = _json.dumps(report, sort_keys=True)
    print(out)
    if args.output_path:
        with open(args.output_path, "w") as f:
            f.write(out + "\n")


PLAN_LINT_RULES = (
    # (severity, pattern, message)
    ("error", "CartesianProduct",
     "non-broadcast cross join: O(n*m) at scale — broadcast the small "
     "side or add an equi-join key"),
    ("error", "BatchEvalPython",
     "row-at-a-time Python UDF in the plan — use built-in functions or "
     "an Arrow-batched pandas UDF (ArrowEvalPython)"),
    # r10 review class: monotonically_increasing_id re-evaluates
    # independently per physical subtree, so a self-join keyed on it
    # can pair rows with ANOTHER row's id whenever the input lineage
    # shuffles — results become silently nondeterministic.  It is
    # only safe when the id never crosses a join boundary; a plan
    # that carries it deserves a human look either way.
    ("warn", "monotonically_increasing_id",
     "synthetic row id in the plan: nondeterministic downstream of a "
     "shuffle and UNSAFE as a join key (each join branch re-evaluates "
     "it independently) — key on real columns or a hash of them"),
)


def lint_plan(plan: str) -> list[tuple[str, str]]:
    """Scan a formatted physical plan for the anti-patterns that
    silently kill a 100TB run.  Returns (severity, message) findings;
    the same patterns the repo's plan-shape tests gate, exposed as an
    operator-facing pre-launch check."""
    import re as _re

    findings = []
    for sev, pat, msg in PLAN_LINT_RULES:
        if pat in plan:
            findings.append((sev, f"{pat}: {msg}"))
    # a GLOBAL sort (the `true` flag in the Sort node's Arguments; in
    # formatted mode the detail block reads `(n) Sort ... Arguments:
    # [...], true, 0`) that is not a TakeOrdered top-k is an all-data
    # sort — warn
    if "TakeOrderedAndProject" not in plan:
        if _re.search(
            r"\(\d+\) Sort\b[^(]*?Arguments: \[[^\]]*\], true,", plan, _re.S
        ) or _re.search(r"\bSort \[[^\]]*\], true,", plan):
            findings.append(
                ("warn",
                 "global Sort without a limit: all rows sort on one "
                 "ordering — confirm this is a deliberate final "
                 "ordering, or use TakeOrdered/top-k")
            )
    return findings


def run_lint(spark, args):
    """Pre-launch plan review for registry queries: build each plan
    (no execution beyond what plan construction itself requires) and
    report scale anti-patterns.  --strict exits nonzero on any
    error-severity finding — the CI hook form."""
    from telemetry_streaming_spark.plans.queries import QUERIES

    names = list(QUERIES) if args.all else (args.query or "").split(",")
    bad = [n for n in names if n not in QUERIES]
    if bad or not names or names == [""]:
        raise SystemExit(f"unknown or missing query names: {bad or '(none given)'}")
    n_errors = 0
    for name in names:
        try:
            df = QUERIES[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # a query that cannot even plan is a finding
            print(f"{name}: error: failed to build plan: {exc}")
            n_errors += 1
            continue
        findings = lint_plan(plan)
        for sev, msg in findings:
            print(f"{name}: {sev}: {msg}")
            if sev == "error":
                n_errors += 1
        if not findings:
            print(f"{name}: clean")
    if args.strict and n_errors:
        raise SystemExit(f"lint: {n_errors} error finding(s)")


def run_sql(spark, args):
    """Ad-hoc SQL over the registered tables — the query-engine face
    of the repo: every parquet table in --sf-dir becomes a temp view
    (region nation customer supplier part orders lineitem events
    documents embeddings), the statement plans through the same
    Catalyst session defaults as the registry queries, and the result
    goes to parquet (--output-path) or stdout (first --limit rows)."""
    from telemetry_streaming_spark.sources.registry import register_views

    _require(args, "query")
    register_views(spark, args.sf_dir)
    df = spark.sql(args.query)
    if args.explain:
        df.explain("formatted")
        return
    if args.output_path:
        df.write.mode("overwrite").parquet(args.output_path)
        print(f"rows: {spark.read.parquet(args.output_path).count()}")
    else:
        df.show(args.limit, truncate=False)


def run_curate(spark, args):
    """Training-data curation as an operable job: documents parquet in,
    split-partitioned curated corpus + stage-funnel report out."""
    from telemetry_streaming_spark.ext.curation import CurationConfig, curate, funnel_counts
    from telemetry_streaming_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    _require(args, "input-path", "output-path")
    if args.checkpoint_mode == "reliable":
        # W10-adjacent: durable lineage cuts for the iterative dedup
        # stages, so a 100 TB run survives executor loss without
        # recomputing the postings/banding stages from the scan.
        _require(args, "checkpoint-dir")
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
    docs = spark.read.parquet(args.input_path)
    cfg = CurationConfig(
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_quality=args.min_quality,
        keep_langs=tuple(args.keep_langs.split(",")),
        eval_rate=args.eval_rate,
        chunk_dedup_words=args.chunk_dedup_words,
    )
    bench = spark.read.parquet(args.benchmark_path) if args.benchmark_path else None
    pairs = None
    if args.near_dup == "minhash":
        pairs = minhash_lsh_pairs(
            docs,
            threshold=args.near_dup_threshold,
            checkpoint_mode=args.checkpoint_mode,
        )
    elif args.near_dup == "simhash":
        pairs = simhash_pairs(docs)
    out = curate(docs, cfg, near_dup_pairs=pairs, benchmark=bench)
    if args.token_budget_per_source is not None and args.token_budget_per_source <= 0:
        raise SystemExit("--token-budget-per-source must be positive")
    if args.token_budget_per_source:
        # final mixture bound: cap each source's TOKEN contribution
        # (deterministic md5 order, bucketed two-level prefix sum — no
        # hot source sorts in one task)
        from pyspark.sql import functions as F

        from telemetry_streaming_spark.functions.text import token_count
        from telemetry_streaming_spark.operators.sampling import per_group_budget

        out = per_group_budget(
            out.withColumn("__n_tok", token_count(F.col("text"))),
            "source", "doc_id", "__n_tok",
            budget=args.token_budget_per_source,
        ).drop("__n_tok")
    if args.explain:
        out.explain("formatted")
        return
    (
        out.repartition(args.num_parquet_files, "split")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(args.output_path)
    )
    for r in funnel_counts(docs, cfg).collect():
        print(f"{r['stage']}: {r['n_docs']}")


def run_hygiene(spark, args):
    """Corpus hygiene as an operable job: documents parquet in, a
    chunk-deduped (and optionally decontaminated) corpus out, plus a
    per-doc duplicated-window report when asked."""
    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.contamination import (
        chunk_dedup_apply,
        decontaminate,
        dup_window_fraction,
        remove_duplicated_spans,
    )

    _require(args, "input-path", "output-path")
    docs = spark.read.parquet(args.input_path)
    n_in = docs.count()
    out = docs
    if args.benchmark_path:
        bench = spark.read.parquet(args.benchmark_path)
        out = decontaminate(out, bench, n=args.contamination_ngram)
    gate_cache = None
    if args.lm_max_nlp is not None and not (args.explain and not args.lm_path):
        # CCNet-style perplexity gate: drop docs whose avg token
        # negative log-prob under the LM exceeds the threshold (docs
        # too short to score pass through).  With --lm-path the gate is
        # a lazy parquet probe and shows up in --explain; withOUT it
        # the self-trained LM build is eager (localCheckpoint inside
        # bigram_lm_table), so --explain skips the gate rather than
        # running real jobs.
        from telemetry_streaming_spark.operators.lm import bigram_lm_score

        lm_table = (
            spark.read.parquet(args.lm_path) if args.lm_path else None
        )
        # the upstream pipeline feeds the scorer up to three times (c2
        # build when self-training, the gram probe side, the outer
        # join side) — persist it once instead of re-running
        # decontaminate; released after the output write
        gate_cache = out = out.persist()
        scores = bigram_lm_score(out, lm_table=lm_table).select(
            "doc_id", "avg_neg_logprob"
        )
        out = (
            out.join(scores, "doc_id", "left")
            .where(
                F.col("avg_neg_logprob").isNull()
                | (F.col("avg_neg_logprob") <= args.lm_max_nlp)
            )
            .drop("avg_neg_logprob")
        )
    if args.span_dedup_ngram:
        out = remove_duplicated_spans(out, n=args.span_dedup_ngram)
    out = chunk_dedup_apply(out, words_per_chunk=args.chunk_words)
    if args.min_tokens > 0:
        from telemetry_streaming_spark.functions.text import token_count

        out = out.where(
            (F.length(F.col("text")) > 0) & (token_count(F.col("text")) >= args.min_tokens)
        )
    if args.explain:
        out.explain("formatted")
        return
    out.repartition(args.num_parquet_files).write.mode("overwrite").parquet(args.output_path)
    if gate_cache is not None:
        # the pre-gate corpus is only needed while the write consumes
        # it; release before the (potentially heavy) dup-report job
        gate_cache.unpersist()
    n_out = spark.read.parquet(args.output_path).count()
    print(f"docs_in: {n_in}")
    print(f"docs_out: {n_out}")
    if args.dup_report_path:
        dup_window_fraction(docs, n=args.dup_window_ngram).write.mode("overwrite").parquet(
            args.dup_report_path
        )


def run_train(spark, args):
    """Trainer-in-the-loop jobs over a documents parquet: each task
    runs cluster-side aggregation with a bounded driver solve and
    writes a deployable artifact.

    - ``quality-logit``: distributed IRLS logistic fit of a SQL-
      expressed teacher label against the quality features; writes the
      weights as JSON — deployable straight into
      ``quality_logit(text, weights)`` as plan literals.
    - ``bpe``: distributed BPE merge training (vocab-first); writes
      the ordered merge list as JSON.
    - ``lm``: builds the bigram count LM table; writes it as parquet —
      the ``hygiene --lm-path`` scorer input.
    """
    import json as _json

    _require(args, "input-path", "task", "model-path")
    docs = spark.read.parquet(args.input_path)
    if args.task == "quality-logit":
        from pyspark.sql import functions as F

        from telemetry_streaming_spark.operators.regression import fit_quality_logit

        _require(args, "label-sql")
        weights, iters = fit_quality_logit(
            docs, F.expr(args.label_sql), max_iters=args.max_iters
        )
        artifact = {
            "task": "quality-logit",
            "weights": {"bias": weights[0], "len": weights[1],
                        "punct": weights[2], "atl": weights[3]},
            "iterations": iters,
            "label_sql": args.label_sql,
        }
        with open(args.model_path, "w") as f:
            _json.dump(artifact, f, indent=2)
        print(f"iterations: {iters}")
        print(f"weights: {[round(w, 6) for w in weights]}")
    elif args.task == "bpe":
        from telemetry_streaming_spark.operators.tokenizer import train_bpe

        merges = train_bpe(docs, n_merges=args.n_merges)
        with open(args.model_path, "w") as f:
            _json.dump(
                {"task": "bpe", "merges": [list(m) for m in merges]}, f, indent=2
            )
        print(f"merges: {len(merges)}")
    elif args.task == "lm":
        from telemetry_streaming_spark.operators.lm import bigram_lm_table

        table = bigram_lm_table(docs)
        table.repartition(args.num_parquet_files).write.mode("overwrite").parquet(
            args.model_path
        )
        n = spark.read.parquet(args.model_path).count()
        print(f"lm_grams: {n}")
    else:
        raise SystemExit(f"unknown --task {args.task!r}")


def run_export(spark, args):
    """Deterministic training-data export: corpus parquet in, N md5
    shards (salt-seeded global shuffle, one file per shard) + a
    recomputable manifest out."""
    from telemetry_streaming_spark.operators.export import export_shards, shard_manifest

    _require(args, "input-path", "output-path")
    df = spark.read.parquet(args.input_path)
    export_shards(
        df,
        args.output_path,
        id_col=args.id_col,
        n_shards=args.num_shards,
        salt=args.salt,
        mode="overwrite",
    )
    manifest = shard_manifest(
        df, args.id_col, args.num_shards, args.salt,
        size_col=args.size_col or None,
    )
    # collect once (n_shards rows), then persist the collected rows —
    # computing the manifest aggregation twice (write + collect) would
    # double its full-corpus scan at scale
    rows = manifest.collect()
    if args.manifest_path:
        spark.createDataFrame(rows, manifest.schema).repartition(1).write.mode(
            "overwrite"
        ).parquet(args.manifest_path)
    total = sum(r["n_rows"] for r in rows)
    print(f"shards: {len(rows)}")
    print(f"rows: {total}")
    print(f"max_shard_rows: {max((r['n_rows'] for r in rows), default=0)}")
    if any(r["n_keys"] < r["n_rows"] for r in rows):
        print("WARNING: duplicate ids detected (n_keys < n_rows); "
              "intra-shard order is not layout-independent for tied rows")


def build_parser() -> argparse.ArgumentParser:
    top = argparse.ArgumentParser(prog="telemetry_streaming_spark")
    sub = top.add_subparsers(dest="job", required=True)

    for name in ("error_aggregator", "experiments_error_aggregator", "event_ping_events",
                 "experiment_enrollments"):
        _add_common(sub.add_parser(name))

    p = sub.add_parser("enrollments_to_testtube")
    _add_common(p)
    p.add_argument("--url")

    p = sub.add_parser("uptake_to_datadog")
    _add_common(p)
    p.add_argument("--statsd-host")
    p.add_argument("--statsd-port", type=int, default=8125)

    for proto in ("influx", "opentsdb"):
        p = sub.add_parser(f"crashes_to_{proto}")
        _add_common(p)
        p.add_argument("--url")
        p.add_argument("--measurement", default="crashes")
        p.add_argument("--max-batch-size", type=int, default=500)
        p.add_argument("--max-parallel-requests", type=int, default=100)

    p = sub.add_parser("events_to_amplitude")
    _add_common(p)
    p.add_argument("--config", help="amplitude event-spec JSON")
    p.add_argument("--url")
    p.add_argument("--api-key")
    p.add_argument("--sample", type=float, default=1.0)

    p = sub.add_parser("federated_optimizer")
    _add_common(p)
    p.add_argument("--state-path")
    p.add_argument("--model-output-path")
    p.add_argument("--model-branch", default="frecency-update-study")

    p = sub.add_parser("curate", help="training-data curation funnel")
    p.add_argument("--input-path")
    p.add_argument("--output-path")
    p.add_argument("--num-parquet-files", type=int, default=60)
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--keep-langs", default="en")
    p.add_argument("--eval-rate", type=float, default=0.05)
    p.add_argument("--near-dup", choices=("none", "minhash", "simhash"), default="none")
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    p.add_argument("--benchmark-path", help="decontaminate against this parquet")
    p.add_argument("--chunk-dedup-words", type=int, help="chunk-dedup rewrite width")
    p.add_argument(
        "--token-budget-per-source", type=int,
        help="cap each source's TOKEN contribution (deterministic md5 order)",
    )
    p.add_argument(
        "--checkpoint-mode",
        choices=("local", "reliable"),
        default="local",
        help="lineage-cut durability for iterative dedup stages",
    )
    p.add_argument("--checkpoint-dir", help="durable dir for --checkpoint-mode reliable")
    p.add_argument("--explain", action="store_true")

    p = sub.add_parser("hygiene", help="chunk dedup + decontamination pass")
    p.add_argument("--input-path")
    p.add_argument("--output-path")
    p.add_argument("--benchmark-path", help="eval/benchmark parquet to decontaminate against")
    p.add_argument("--chunk-words", type=int, default=10)
    p.add_argument("--contamination-ngram", type=int, default=4)
    p.add_argument(
        "--span-dedup-ngram", type=int,
        help="cut corpus-duplicated n-token spans before chunk dedup",
    )
    p.add_argument("--min-tokens", type=int, default=1)
    p.add_argument("--dup-report-path", help="write dup-window fractions here")
    p.add_argument("--dup-window-ngram", type=int, default=8)
    p.add_argument(
        "--lm-max-nlp", type=float,
        help="drop docs whose avg bigram neg-logprob exceeds this "
        "(CCNet perplexity gate; scores against --lm-path or self)",
    )
    p.add_argument("--lm-path", help="pre-trained LM table parquet (train --task lm)")
    p.add_argument("--num-parquet-files", type=int, default=60)
    p.add_argument("--explain", action="store_true")

    p = sub.add_parser("train", help="quality-logit / BPE / LM trainers")
    p.add_argument("--input-path")
    p.add_argument("--task", choices=["quality-logit", "bpe", "lm"])
    p.add_argument("--model-path", help="artifact destination (JSON or parquet)")
    p.add_argument(
        "--label-sql",
        help="quality-logit teacher label as a SQL boolean expression "
        "over the input columns, e.g. \"lang = 'en'\"",
    )
    p.add_argument("--max-iters", type=int, default=25)
    p.add_argument("--n-merges", type=int, default=10)
    p.add_argument("--num-parquet-files", type=int, default=16)

    p = sub.add_parser("export", help="deterministic sharded training export")
    p.add_argument("--input-path")
    p.add_argument("--output-path")
    p.add_argument("--manifest-path", help="write the shard manifest parquet here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--num-shards", type=int, default=64)
    p.add_argument("--salt", default="", help="epoch seed: a new salt is a fresh global shuffle")
    p.add_argument("--size-col", default="", help="payload size column for the manifest")

    p = sub.add_parser("minhash_index", help="nightly near-dup admission index")
    p.add_argument("--mode", choices=("build", "admit"), default="build")
    p.add_argument("--input-path", help="corpus (build) / nightly batch (admit) parquet")
    p.add_argument("--index-path", help="persisted band-index parquet dir")
    p.add_argument("--corpus-path", help="corpus documents parquet (admit)")
    p.add_argument("--output-path", help="admitted documents parquet (admit)")
    p.add_argument("--update-index", action="store_true",
                   help="append admitted documents' bands to the index")
    p.add_argument("--num-perm", type=int, default=8)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    p.add_argument("--stream-input", help="continuous admission: watched parquet dir")
    p.add_argument("--checkpoint-path", help="stream checkpoint dir (stream mode)")
    p.add_argument("--max-files-per-trigger", type=int, default=1,
                   help="files per admission micro-batch (1 honors per-drop admission)")
    p.add_argument("--pairs-output",
                   help="also write each batch's (id1, id2) near-dup pairs "
                        "as a batch subdir `clusters --pairs-input` consumes")
    p.add_argument("--pairs-batch-name", default=None,
                   help="batch subdir name under --pairs-output; stream "
                        "epochs suffix -epochN; reruns overwrite. Default: "
                        "'batch' in stream mode, 'batch-<basename>-<path "
                        "hash>' in batch mode (distinct drops never collide)")

    p = sub.add_parser(
        "maintain",
        help="index maintenance: admit + compact + re-probe verify, restartable",
    )
    p.add_argument("--index-path", help="persisted band-index parquet dir")
    p.add_argument("--corpus-path", help="corpus documents parquet")
    p.add_argument("--output-path", help="admitted documents parquet")
    p.add_argument("--stream-input", help="watched parquet dir of nightly drops")
    p.add_argument("--checkpoint-path", help="admission stream checkpoint dir")
    p.add_argument("--num-perm", type=int, default=8)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument("--target-file-mb", type=int, default=256,
                   help="compacted index file sizing")
    p.add_argument("--pairs-output",
                   help="also write the night's (id1, id2) near-dup pairs "
                        "as a batch subdir `clusters --pairs-input` consumes")
    p.add_argument("--pairs-batch-name", default=None,
                   help="batch subdir name under --pairs-output "
                        "(e.g. night-2024-01-01); reruns overwrite it. "
                        "Default: 'batch' in stream mode (epoch-suffixed), "
                        "'batch-<basename>-<path hash>' in batch mode")

    p = sub.add_parser(
        "clusters",
        help="nightly duplicate-cluster labeling update, restartable",
    )
    p.add_argument("--pairs-input",
                   help="dir of batch-named parquet subdirs of (id1, id2) pairs")
    p.add_argument("--labels-path",
                   help="persisted (id, component) labeling parquet dir "
                        "(carries _manifest.json inside)")
    p.add_argument("--id1-col", default="id1")
    p.add_argument("--id2-col", default="id2")

    p = sub.add_parser("ann_index", help="persisted IVF ANN index build/query")
    p.add_argument("--mode", choices=("build", "query"), default="build")
    p.add_argument("--input-path", help="embeddings (build) / queries (query) parquet")
    p.add_argument("--index-path", help="index root dir (assignments/ + centroids/)")
    p.add_argument("--output-path", help="top-k results parquet (query)")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--nlist", type=int, default=16)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument(
        "--pq-m", type=int,
        help="build: also train m-subspace PQ codebooks and store codes (IVF-PQ)",
    )
    p.add_argument("--pq-k", type=int, default=16, help="PQ centroids per subspace")
    p.add_argument(
        "--use-pq", action="store_true",
        help="query: score probed clusters by ADC codes instead of exact cosine",
    )
    p.add_argument("--explain", action="store_true")

    p = sub.add_parser("rollup", help="incremental date-partitioned rollup (manifest-driven)")
    p.add_argument("--input-path", help="dir of date-named parquet subdirs")
    p.add_argument("--output-path", help="rollup dir (date=<d> partitions + _manifest.json)")
    p.add_argument("--group-by", help="comma-separated grain columns")
    p.add_argument("--sum-col", help="numeric column summed as exact integer cents")
    p.add_argument("--distinct-col",
                   help="also persist a mergeable HLL sketch of this column "
                        "per date and report union distinct estimates")
    p.add_argument("--report-distinct", action="store_true",
                   help="print the sketch-union distinct report even when "
                        "no new dates were processed")
    p.add_argument("--quantile-col",
                   help="also persist a mergeable KLL doubles sketch of this "
                        "column per date and report merged p50/p95/p99")
    p.add_argument("--report-quantiles", action="store_true",
                   help="print the sketch-merge quantile report even when "
                        "no new dates were processed")

    p = sub.add_parser("urlcap", help="URL canonicalize + dedup + per-domain cap")
    p.add_argument("--input-path")
    p.add_argument("--output-path")
    p.add_argument("--url-col", default="url")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--cap", type=int, default=1000)
    p.add_argument("--profile-path", help="also write the per-domain hygiene report here")
    p.add_argument("--stream-input",
                   help="continuous frontier admission: watched dir of (id,url) parquet drops")
    p.add_argument("--checkpoint-path", help="admission stream checkpoint dir")
    p.add_argument("--max-files-per-trigger", type=int, default=1)

    p = sub.add_parser("compact", help="small-files parquet compaction")
    p.add_argument("--input-path")
    p.add_argument("--output-path")
    p.add_argument("--target-file-mb", type=int, default=256)
    p.add_argument("--sort-by", help="comma-separated within-file clustering columns")
    p.add_argument("--zorder-by",
                   help="comma-separated numeric columns to Morton-cluster "
                        "(multi-column min/max skipping; excludes --sort-by)")

    p = sub.add_parser("report", help="dataset-card JSON over a documents parquet")
    p.add_argument("--input-path")
    p.add_argument("--output-path", help="also write the JSON here")
    p.add_argument("--span-ngram", type=int, default=8)

    p = sub.add_parser("lint", help="scale anti-pattern scan over registry query plans")
    p.add_argument("--query", help="comma-separated registry query names")
    p.add_argument("--all", action="store_true", help="lint every registry query")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    p.add_argument("--strict", action="store_true", help="exit nonzero on error findings")

    p = sub.add_parser("sql", help="ad-hoc SQL over the registered tables")
    p.add_argument("--query", help="the SQL statement")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--output-path", help="write result parquet here (default: show)")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--explain", action="store_true")
    return top


RUNNERS = {
    "error_aggregator": lambda s, a: run_error_aggregator(s, a),
    "experiments_error_aggregator": lambda s, a: run_error_aggregator(s, a, experiments=True),
    "event_ping_events": run_event_ping_events,
    "experiment_enrollments": run_experiment_enrollments,
    "enrollments_to_testtube": run_enrollments_to_testtube,
    "uptake_to_datadog": run_uptake_to_datadog,
    "crashes_to_influx": lambda s, a: run_crashes(s, a, "influx"),
    "crashes_to_opentsdb": lambda s, a: run_crashes(s, a, "opentsdb"),
    "events_to_amplitude": run_events_to_amplitude,
    "federated_optimizer": run_federated_optimizer,
    "curate": run_curate,
    "hygiene": run_hygiene,
    "train": run_train,
    "export": run_export,
    "minhash_index": run_minhash_index,
    "maintain": run_maintain,
    "clusters": run_clusters,
    "ann_index": run_ann_index,
    "urlcap": run_urlcap,
    "sql": run_sql,
    "lint": run_lint,
    "report": run_report,
    "compact": run_compact,
    "rollup": run_rollup,
}


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> None:
    args = build_parser().parse_args(argv)
    if spark is None:
        from telemetry_streaming_spark.session import get_spark

        spark = get_spark(app_name=f"tss-{args.job}")
    RUNNERS[args.job](spark, args)


if __name__ == "__main__":
    main(sys.argv[1:])
