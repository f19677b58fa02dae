"""PIPELINE.md executes: the documented end-to-end curation flow runs
verbatim (profile -> curate -> hygiene -> train -> index build -> export), so
the walkthrough cannot rot.  Uses sf0.001 for speed; the doc shows
sf0.01 paths but the commands are identical."""

import os

from telemetry_streaming_spark.cli import main

RAW = "/root/testdata/sf0.001/documents.parquet"
SF = "/root/testdata/sf0.001"


def test_pipeline_walkthrough(spark, tmp_path, capsys):
    work = str(tmp_path)

    # 0. URL hygiene on the synthesized crawl frontier (r10)
    main([
        "sql", "--sf-dir", SF,
        "--query",
        "SELECT doc_id, 'https://www.' || source || '.com/d/' "
        "|| CAST(doc_id AS STRING) || '/?utm_source=crawl' AS url "
        "FROM documents",
        "--output-path", f"{work}/frontier",
    ], spark=spark)
    main([
        "urlcap", "--input-path", f"{work}/frontier",
        "--output-path", f"{work}/frontier_kept",
        "--cap", "20", "--profile-path", f"{work}/domains",
    ], spark=spark)
    kept = spark.read.parquet(f"{work}/frontier_kept")
    # 20 sources x 25 docs each, cap 20 -> exactly 20 survive per domain
    assert kept.groupBy("domain").count().where("count > 20").count() == 0
    assert kept.count() == 20 * 20
    domains = spark.read.parquet(f"{work}/domains")
    assert domains.count() == 20
    # unique synthetic URLs: canonical collapse is a no-op here and the
    # profile must say so (dup_rate 0), while canon still strips www+utm
    assert domains.where("dup_rate_e6 != 0").count() == 0
    assert kept.where("canon_url LIKE '%utm%' OR canon_url LIKE 'www%'").count() == 0

    # 1. profile
    main([
        "sql", "--sf-dir", SF,
        "--query",
        "SELECT source, COUNT(*) n_docs, SUM(n_chars) chars "
        "FROM documents GROUP BY source ORDER BY chars DESC",
        "--output-path", f"{work}/profile",
    ], spark=spark)
    assert spark.read.parquet(f"{work}/profile").count() > 0

    # 2. curate with reliable checkpointing + minhash near-dup
    main([
        "curate", "--input-path", RAW, "--output-path", f"{work}/curated",
        "--min-tokens", "3", "--min-quality", "0.0",
        "--keep-langs", "en,es,fr,de,zh,und",
        "--near-dup", "minhash", "--checkpoint-mode", "reliable",
        "--checkpoint-dir", f"{work}/ckpt", "--num-parquet-files", "4",
    ], spark=spark)
    curated = spark.read.parquet(f"{work}/curated")
    assert curated.count() > 0
    train_dir = f"{work}/curated/split=train"
    assert os.path.isdir(train_dir)

    # 3. hygiene: span dedup + chunk dedup
    main([
        "hygiene", "--input-path", train_dir,
        "--output-path", f"{work}/clean", "--span-dedup-ngram", "8",
        "--chunk-words", "10", "--min-tokens", "3",
        "--num-parquet-files", "4",
    ], spark=spark)
    clean = spark.read.parquet(f"{work}/clean")
    n_clean = clean.count()
    assert 0 < n_clean <= curated.where("split = 'train'").count()

    # 4. train the corpus models from the cleaned data
    import json

    main([
        "train", "--input-path", f"{work}/clean", "--task", "lm",
        "--model-path", f"{work}/lm",
    ], spark=spark)
    assert spark.read.parquet(f"{work}/lm").count() > 0
    main([
        "train", "--input-path", f"{work}/clean", "--task", "quality-logit",
        "--model-path", f"{work}/quality.json", "--label-sql", "lang = 'en'",
    ], spark=spark)
    q_art = json.loads(open(f"{work}/quality.json").read())
    assert set(q_art["weights"]) == {"bias", "len", "punct", "atl"}
    main([
        "train", "--input-path", f"{work}/clean", "--task", "bpe",
        "--model-path", f"{work}/bpe.json", "--n-merges", "8",
    ], spark=spark)
    assert len(json.loads(open(f"{work}/bpe.json").read())["merges"]) > 0

    # 5. admission index over the clean corpus
    main([
        "minhash_index", "--mode", "build",
        "--input-path", f"{work}/clean", "--index-path", f"{work}/idx",
    ], spark=spark)
    assert spark.read.parquet(f"{work}/idx").count() == n_clean * 4  # 4 bands/doc

    # 6. deterministic export + manifest
    main([
        "export", "--input-path", f"{work}/clean",
        "--output-path", f"{work}/shards",
        "--manifest-path", f"{work}/manifest",
        "--num-shards", "8", "--salt", "epoch0",
    ], spark=spark)
    manifest = spark.read.parquet(f"{work}/manifest")
    assert manifest.count() == 8
    assert manifest.agg({"n_rows": "sum"}).first()[0] == n_clean

    # 5b. one-invocation nightly loop: admit -> compact -> verify
    # (drop one new doc into the watched dir, then maintain)
    incoming = f"{work}/incoming"
    os.makedirs(incoming)
    spark.createDataFrame(
        [(990_001, "a brand new nightly document about engines", "en", "web", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{incoming}/night1")
    main([
        "maintain", "--stream-input", incoming + "/*",
        "--corpus-path", f"{work}/clean", "--index-path", f"{work}/idx",
        "--output-path", f"{work}/admitted",
        "--checkpoint-path", f"{work}/maintain_ckpt",
    ], spark=spark)
    out = capsys.readouterr().out
    assert "maintain_reprobe_found: 1" in out
    assert spark.read.parquet(f"{work}/admitted").count() == 1

    # 5b2. the labeling half of the nightly loop: near-dup PAIRS from
    # the corpus fold into the persisted cluster labeling, and the
    # result equals a from-scratch resolve
    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.components import (
        connected_components,
    )
    from telemetry_streaming_spark.operators.dedup import minhash_lsh_pairs

    docs_now = spark.read.parquet(f"{work}/clean").where(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 3
    )
    pairs = minhash_lsh_pairs(docs_now, threshold=0.1)
    os.makedirs(f"{work}/pair_batches", exist_ok=True)
    pairs.write.mode("overwrite").parquet(f"{work}/pair_batches/night1")
    main([
        "clusters", "--pairs-input", f"{work}/pair_batches",
        "--labels-path", f"{work}/clusters",
    ], spark=spark)
    cluster_out = capsys.readouterr().out
    assert "clusters_batches_processed: 1" in cluster_out
    got_labels = {
        (r["id"], r["component"])
        for r in spark.read.parquet(f"{work}/clusters").collect()
    }
    expect_labels = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got_labels == expect_labels

    # 5b3. night 2, the CHAINED nightly sequence (r8 verdict item 6):
    # drop a near-dup of an existing corpus doc; maintain rejects it
    # AND writes its (id1, id2) pair drop via --pairs-output; clusters
    # folds that drop incrementally; the rejected doc must land in its
    # corpus twin's component.
    twin = spark.read.parquet(f"{work}/clean").orderBy("doc_id").first()
    spark.createDataFrame(
        [(
            990_002,
            twin["text"],  # verbatim copy -> certain near-dup rejection
            twin["lang"], twin["source"], twin["n_chars"],
        )],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{incoming}/night2")
    main([
        "maintain", "--stream-input", incoming + "/*",
        "--corpus-path", f"{work}/clean", "--index-path", f"{work}/idx",
        "--output-path", f"{work}/admitted",
        "--checkpoint-path", f"{work}/maintain_ckpt",
        "--pairs-output", f"{work}/pair_batches",
        "--pairs-batch-name", "night2",
    ], spark=spark)
    night2_out = capsys.readouterr().out
    assert "rejected: 1" in night2_out
    assert "pairs_written: " in night2_out
    night2_batches = [
        d for d in os.listdir(f"{work}/pair_batches") if d.startswith("night2")
    ]
    assert night2_batches, "maintain wrote no night2 pair batch"
    main([
        "clusters", "--pairs-input", f"{work}/pair_batches",
        "--labels-path", f"{work}/clusters",
    ], spark=spark)
    night2_cluster_out = capsys.readouterr().out
    assert "clusters_batches_processed: 1" in night2_cluster_out
    labels_now = {
        r["id"]: r["component"]
        for r in spark.read.parquet(f"{work}/clusters").collect()
    }
    assert 990_002 in labels_now
    assert labels_now[990_002] == labels_now.get(
        twin["doc_id"], twin["doc_id"]
    ), "rejected near-dup did not join its corpus twin's cluster"

    # 5c. incremental day-grain rollup over date-named dirs
    # (maintain --update-index appended the admitted doc to the
    # corpus, so count the corpus as it stands now)
    n_corpus = spark.read.parquet(f"{work}/clean").count()
    assert n_corpus == n_clean + 1
    spark.read.parquet(f"{work}/clean").write.parquet(f"{work}/daily/20240101")
    main([
        "rollup", "--input-path", f"{work}/daily",
        "--output-path", f"{work}/rollup", "--group-by", "source",
        "--quantile-col", "n_chars",
    ], spark=spark)
    roll_out = capsys.readouterr().out
    assert "rollup_dates_processed: 1" in roll_out
    assert "rollup_quantiles[" in roll_out  # merged KLL p50/p95/p99
    assert (
        spark.read.parquet(f"{work}/rollup").agg({"n_rows": "sum"}).first()[0]
        == n_corpus
    )

    # 6b. z-order re-cluster of the shipped shards
    main([
        "compact", "--input-path", f"{work}/shards",
        "--output-path", f"{work}/shards_z", "--target-file-mb", "1",
        "--zorder-by", "doc_id,n_chars",
    ], spark=spark)
    assert spark.read.parquet(f"{work}/shards_z").count() == n_clean

    # 7. plan review prints without executing; lint gates the launch
    main([
        "sql", "--sf-dir", SF,
        "--query", "SELECT COUNT(*) AS n FROM documents", "--explain",
    ], spark=spark)
    assert "Physical Plan" in capsys.readouterr().out
    main([
        "lint", "--strict", "--sf-dir", SF,
        "--query", "dedup_minhash_lsh,similarity_topk",
    ], spark=spark)
    assert capsys.readouterr().out.count("clean") == 2
