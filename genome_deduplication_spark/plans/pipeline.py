"""The flagship plan: near-duplicate detection + clustering over pages.

Stage graph (each boundary = checkpoint + lineage metrics, the Spark
re-expression of the reference's sequential engine — see SURVEY.md §3.1):

  1 normalize   extract/normalize text; split off ambiguous docs
                (reference: sequence cleaning + N handling,
                 code/dedup2.py:467-468,114-131)
  2 signatures  distinct shingle set -> MinHash(128) + SimHash(64)
                (reference: k-mer loop + global set, code/dedup2.py:135-142)
  3 candidates  exact-hash clusters short-circuit + LSH band buckets -> pairs
  4 verify      Jaccard estimate + SimHash Hamming -> verified edges
  5 substring   suffix-array exact long-substring pass on near-miss pairs
                (reference masks, code/dedup2.py:18,235-246)
  6 components  connected components -> cluster ids
                (reference transitive cross-file state, code/dedup2.py:549-554)
  7 clusters    canonical election min(warc_ts, url) per component
                (first-occurrence-wins, code/dedup2.py:420-421)

Column-pruning note for 100 TB: `html` is only touched in stage 1 and
`text` only in stages 1-2 and the (small) stage-5 pair join — every other
stage moves fixed-width signatures/edges. The stage-boundary parquet
checkpoints make that pruning physical, not just logical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genome_deduplication_spark.config import DedupConfig
from genome_deduplication_spark.functions.signatures import make_doc_signature_udf
from genome_deduplication_spark.functions.text import (
    extract_text_from_html,
    normalize_text,
)
from genome_deduplication_spark.operators.connected_components import (
    components_for_string_ids,
)
from genome_deduplication_spark.operators.exact_dedup import content_key
from genome_deduplication_spark.operators.lsh import candidate_pairs
from genome_deduplication_spark.operators.suffix_array import (
    exact_substring_pairs,
    pairs_from_anchor_rows,
)
from genome_deduplication_spark.operators.verify import verify_pairs
from genome_deduplication_spark.sources.checkpoint import RunContext


def dedup_pipeline(
    pages: DataFrame,
    cfg: DedupConfig,
    run_dir: str | None = None,
    enable_substring_pass: bool = True,
) -> dict[str, DataFrame]:
    """Run the full plan; returns the stage tables.

    ``run_dir=None`` runs without checkpointing (tests/small inputs);
    otherwise every stage is materialized + resumable.
    """
    spark = pages.sparkSession
    ctx = (
        RunContext(spark, run_dir, cfg.to_json()) if run_dir is not None else None
    )

    resumed: set[str] = set()
    sc = spark.sparkContext

    def described(name: str, thunk):
        # tag the jobs this stage materializes ("stage:<name>" in the Spark
        # UI / event log) and restore the caller's description after —
        # profilers aggregating SparkListenerJobStart get per-stage
        # attribution instead of anonymous lambda callsites
        prev = sc.getLocalProperty("spark.job.description")
        sc.setJobDescription(f"stage:{name}")
        try:
            return thunk()
        finally:
            sc.setJobDescription(prev)

    def stage(name: str, build, reused: bool = True):
        if ctx is None:
            # No durable checkpoint requested: multi-consumer stages are
            # EAGERLY localCheckpointed. Lazy marking looked cheaper (no
            # barrier job) but does not persist under AQE — the adaptive
            # plan computes a different RDD than the marked one, so every
            # downstream consumer silently recomputed the stage (for the
            # signatures stage that means re-running the pandas-UDF kernel
            # per consumer). Interleaved A/B comparison at 160k docs:
            # eager 79/105/43 s vs lazy 146/229/61 s — eager wins every
            # adjacent pair (BENCH.md round 4). Single-consumer stages
            # (reused=False) stay unmaterialized so Catalyst fuses them.
            df = build()
            if reused:
                return described(
                    name, lambda: df.localCheckpoint(eager=True)
                )
            return df
        if ctx.is_complete(name):
            resumed.add(name)
        return described(name, lambda: ctx.stage(name, build))

    def metrics(name: str, guard_stage: str | None = None, **kv):
        # kv values are thunks — only evaluated (each is a Spark job) when a
        # run context is recording lineage. guard_stage makes the block
        # exactly-once across resumes: a stage reused from its checkpoint
        # already wrote its metrics in the run that built it, so re-running
        # the (Spark-job) thunks would both waste jobs and append duplicate
        # rows (record_metrics also replaces per-stage, as defense in depth).
        if ctx is None or (guard_stage is not None and guard_stage in resumed):
            return
        ctx.record_metrics(name, {k: v() for k, v in kv.items()})

    # -- 1 normalize ----------------------------------------------------------
    # the reference's parse+clean entry (code/dedup2.py:461-468): when the
    # page carries raw html and no pre-extracted text, the deterministic
    # extractor produces it — same html bytes => same text for every url
    # (the input_hint's byte-identical-extraction invariant; the extractor
    # is versioned pure string algebra, functions/text.py EXTRACTOR_VERSION)
    def _normalize():
        text_expr = normalize_text(F.col("text"))
        if "html" in pages.columns:
            text_expr = F.coalesce(
                text_expr, extract_text_from_html(F.col("html"))
            )
        norm = pages.select(
            "url",
            "warc_ts",
            text_expr.alias("text"),
            "lang",
        )
        return norm.withColumn(
            "is_ambiguous",
            F.col("text").isNull() | (F.length("text") < cfg.shingle_k),
        )

    normalized = stage("normalize", _normalize)
    docs = normalized.where(~F.col("is_ambiguous")).drop("is_ambiguous")
    ambiguous = normalized.where(F.col("is_ambiguous"))
    metrics(
        "normalize",
        guard_stage="normalize",
        docs_in=pages.count,
        docs_ok=docs.count,
        docs_ambiguous=ambiguous.count,
    )

    # -- 2 signatures ----------------------------------------------------------
    # one Arrow pass per document computes shingles (O(n) rolling hash),
    # MinHash, SimHash AND the exact-substring anchor index; struct fields
    # are extracted immediately (checkpointing a raw struct column is
    # pathologically slow in the serializer)
    doc_signature_udf = make_doc_signature_udf(cfg)

    def _signatures():
        return docs.select(
            "url",
            "warc_ts",
            content_key(F.col("text")).alias("content_hash"),
            doc_signature_udf("text").alias("sig"),
        ).select(
            "url",
            "warc_ts",
            "content_hash",
            F.col("sig.n_shingles").alias("n_shingles"),
            F.col("sig.minhash").alias("minhash"),
            F.col("sig.simhash").alias("simhash"),
            F.col("sig.anchors").alias("anchors"),
        )

    signatures = stage("signatures", _signatures)
    metrics("signatures", guard_stage="signatures", signatures_out=signatures.count)

    # -- 3 candidates ----------------------------------------------------------
    # exact-duplicate short-circuit: identical content hash is a sure edge —
    # no LSH needed; also collapse exact groups to one LSH representative so
    # a 10^6-copy mega-duplicate costs one signature in every band bucket.
    def _exact_edges():
        # star edges canonical->member via a join-back, NOT collect_list:
        # a 10^8-copy boilerplate page must not materialize its whole member
        # list in one reducer row (multi-GB single row -> OOM). The hash
        # aggregation and the join both shuffle on content_hash, so AQE
        # reuses the partitioning; skewed hashes split via AQE skew handling.
        canon = signatures.groupBy("content_hash").agg(
            F.min(F.struct("warc_ts", "url")).alias("_c")
        ).select("content_hash", F.col("_c.url").alias("id_a"))
        return (
            signatures.select("content_hash", F.col("url").alias("id_b"))
            .join(canon, "content_hash")
            .where(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
        )

    # exact_edges is multi-consumer only when the substring pass (known-
    # pairs anti-join) or a recording run context reads it besides the
    # final edge union; otherwise the eager cut is a pure barrier + job
    # with no reuse to pay for it (r6 event-log profile).
    exact_edges_reused = enable_substring_pass or ctx is not None
    exact_edges = None  # materialized below, overlapped when possible

    def _reps():
        # exact-group representatives: one signature per content hash, so a
        # 10^6-copy mega-duplicate costs one signature in every band bucket.
        # The election aggregates NARROW rows only: any string/struct/array
        # aggregate plans a SortAggregate (no mutable buffer), and sorting
        # rows that carry the 1KB minhash array was the single biggest CPU
        # burner of the 640k profile (PLANS.md round 5). Elect ids first,
        # then fetch minhash by semi-join — the rep-id side broadcasts at
        # bench scale and co-partitions at cluster scale.
        rep_ids = (
            signatures.groupBy("content_hash")
            .agg(F.min(F.struct("warc_ts", "url")).alias("_c"))
            .select(F.col("_c.url").alias("url"))
        )
        return signatures.join(rep_ids, "url", "leftsemi").select(
            "url", "minhash"
        )

    # truncation accounting (lsh.py's docstring promise: buckets the
    # candidate stage dropped/capped are accounted, never silent — reference
    # analogue code/dedup2.py:480-493) shares the bucket-counts pass with
    # candidate generation: candidate_pairs() eagerly materializes the
    # counts (one small job at call time), and both the pairs plan and the
    # stats job read the persisted counts instead of re-scanning the
    # signatures.
    trunc_holder: dict = {}

    def _lsh_pairs():
        # reps feed four subtrees of the candidate plan (key projection,
        # id map, and the counts/members sides of the bucket machinery) —
        # materialize once, eagerly (lazy marks are not persisted under
        # AQE, PLANS.md round 4). Before this, the reps election and the
        # band explode each ran twice (640k profile: two ~360-CPU-s
        # SortAggregate stages over the full signature table).
        reps = _reps().localCheckpoint(eager=True)
        if ctx is None:
            return candidate_pairs(reps, cfg, id_col="url", sig_col="minhash")
        pairs, stats = candidate_pairs(
            reps, cfg, id_col="url", sig_col="minhash", with_stats=True
        )
        trunc_holder["stats"] = stats
        return pairs
        # pairs already known exact dups need no subtraction: reps are
        # one-per-content-hash, so same-hash pairs cannot appear

    # exact_edges and the reps/LSH chain are independent given the
    # signatures checkpoint — materialize them concurrently (guide §2.6:
    # actions are only sequential because driver code calls them
    # sequentially; the second job's tasks back-fill executors freed by
    # the first job's tail, and its Catalyst/AQE planning overlaps the
    # first job's execution). Restricted to ctx=None runs: RunContext's
    # manifest bookkeeping is not audited for concurrent writers.
    if ctx is None:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as _pool:
            _f_exact = _pool.submit(
                stage, "exact_edges", _exact_edges, exact_edges_reused
            )
            _f_lsh = _pool.submit(stage, "lsh_pairs", _lsh_pairs, False)
            exact_edges = _f_exact.result()
            lsh_pairs = _f_lsh.result()
    else:
        exact_edges = stage("exact_edges", _exact_edges, exact_edges_reused)
        lsh_pairs = stage("lsh_pairs", _lsh_pairs, reused=False)

    if ctx is not None and "lsh_pairs" not in resumed:
        trunc = trunc_holder["stats"].collect()[0].asDict()
        ctx.record_metrics(
            "candidates",
            {
                "exact_edges": exact_edges.count(),
                "lsh_candidate_pairs": lsh_pairs.count(),
                "lsh_buckets_total": trunc["buckets_total"],
                "lsh_buckets_dropped": trunc["buckets_dropped"] or 0,
                "lsh_buckets_capped": trunc["buckets_capped"] or 0,
                "lsh_docs_in_dropped": trunc["docs_in_dropped"] or 0,
            },
        )

    # -- 4 verify ----------------------------------------------------------------
    def _verified():
        return verify_pairs(lsh_pairs, signatures, cfg, id_col="url")

    def _substr_cand():
        # candidates = anchor-shingle collisions (winnowing index — how a
        # shared-substring pair is *found* without whole-doc similarity).
        # Anchors were computed in the same Arrow pass as the signatures —
        # no text re-hash here. Depends ONLY on the signatures checkpoint,
        # so it can materialize concurrently with the verify stage.
        anchor_rows = signatures.select(
            "url", F.explode("anchors").alias("anchor")
        )
        return pairs_from_anchor_rows(
            anchor_rows,
            max_bucket_size=cfg.anchor_df_cap,
            min_shared_anchors=cfg.min_shared_anchors,
            id_col="url",
        )

    substr_cand = None
    if ctx is None and enable_substring_pass:
        # overlap the two independent subtrees (guide §2.6, same pattern
        # as the exact_edges/lsh pair above): the anchor-bucket candidate
        # machinery back-fills executors while the verify stage's jobs
        # run, and the substring stage below consumes the materialized
        # candidate set instead of re-deriving it inside its lazy plan.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as _pool:
            _f_ver = _pool.submit(stage, "verified", _verified, True)
            _f_cand = _pool.submit(
                described,
                "substr_cand",
                lambda: _substr_cand().localCheckpoint(eager=True),
            )
            verified = _f_ver.result()
            substr_cand = _f_cand.result()
    else:
        verified = stage("verified", _verified)
    dup_edges = verified.where("is_dup").select("id_a", "id_b")
    metrics(
        "verify",
        guard_stage="verified",
        pairs_in=verified.count,
        pairs_dup=dup_edges.count,
    )

    # -- 5 substring pass ---------------------------------------------------------
    if enable_substring_pass:
        def _substr():
            # candidate pairs minus pairs already confirmed dups, run
            # through the suffix-array LCS kernel
            cand = substr_cand if substr_cand is not None else _substr_cand()
            known = exact_edges.union(dup_edges)
            todo = cand.join(known, ["id_a", "id_b"], "left_anti")
            return exact_substring_pairs(
                todo, docs, cfg.min_common_substring, id_col="url"
            )

        substr = stage("substring", _substr, reused=False)
        substr_edges = substr.where("is_substring_dup").select("id_a", "id_b")
        metrics(
            "substring",
            guard_stage="substring",
            pairs_checked=substr.count,
            pairs_substring_dup=substr_edges.count,
        )
    else:
        substr = None
        substr_edges = spark.createDataFrame([], "id_a string, id_b string")

    # -- 6 components ----------------------------------------------------------
    all_edges = exact_edges.union(dup_edges).union(substr_edges)

    def _components():
        return components_for_string_ids(all_edges, docs.select("url"), id_col="url")

    components = stage("components", _components, reused=False)

    # -- 7 clusters: canonical = min(warc_ts, url) within each component ---------
    def _clusters():
        labeled = components.join(docs.select("url", "warc_ts"), "url")
        canon = labeled.groupBy("cluster_key").agg(
            F.min(F.struct("warc_ts", "url")).alias("_c"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        return labeled.join(canon, "cluster_key").select(
            "url",
            F.col("_c.url").alias("cluster_id"),
            "cluster_size",
        )

    clusters = stage("clusters", _clusters)
    metrics(
        "clusters",
        guard_stage="clusters",
        docs_clustered=clusters.count,
        n_clusters=clusters.select("cluster_id").distinct().count,
    )

    return {
        "normalized": normalized,
        "signatures": signatures,
        "exact_edges": exact_edges,
        "lsh_pairs": lsh_pairs,
        "verified": verified,
        "substring": substr,
        "dup_edges": all_edges,
        "components": components,
        "clusters": clusters,
        "ambiguous": ambiguous,
    }
