"""Explain-plan sweep over every registered query.

Mechanizes the scale audit the round judge performs by hand: for each
query in the registry, capture the optimized physical plan and flag
the patterns that do not survive a 100 TB / 1000-executor scale-up:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — O(n*m) joins.
  Allowed only for queries explicitly registered as exact oracles for
  a bucketed scale path (see ALLOW_NESTED_LOOP below).
- ``BatchEvalPython`` — row-at-a-time Python UDF in the plan.  Never
  allowed; Arrow-batched ``ArrowEvalPython`` / ``MapInPandas`` are
  reported but legal (multimodal codecs, fetch seam).
- Exchange (shuffle) count — reported so a query that suddenly grows
  a shuffle shows up in review.
- WholeStageCodegen span count — reported; 0 spans on a relational
  query means interpreted evaluation somewhere hot.

Besides the registry queries, the audit drives the PIPELINE jobs
(the five crawl stages over the stored-HTML lifecycle fixture, ER
vote-name match + backfill, the dump matrix builders) and audits
every pre-action DataFrame they build: crawl writes go through a
capture-and-write ``upsert_parquet`` wrapper so the exact plan each
stage is about to materialize is what gets inspected.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
       (pipeline section runs whenever no explicit query filter is given)
Exit 1 if any hard flag fires outside the allowlist.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# Queries whose plans legitimately contain a nested-loop/cartesian
# join: deliberately-registered EXACT baselines whose scale path
# exists separately (VERDICT r1 framing: oracle, not scale path).
ALLOW_NESTED_LOOP = {
    "knn_bruteforce",  # exact top-k oracle; scale paths are knn_ivf/knn_lsh
    # IVF centroid assignment is a conditionless join of every vector
    # against the broadcast n_lists-row centroid set — O(n * n_lists)
    # by construction (the IVF assignment cost), not a data-scale
    # cartesian.  The candidate join that dominates at scale is the
    # list_id equi-join.
    "knn_ivf",
    # same conditionless centroid attach at n_lists=sqrt(n) — the
    # broadcast side is still index-sized (centroids), not data-scale
    "ann_ivf_sqrt_lists",
    # the recall-vs-n_probe tuning grid (added mid-build r11->r12)
    # repeats the SAME index-sized centroid attach once per probed
    # n_probe setting plus the bounded-panel brute-force exact leg —
    # every NLJ is an already-allowlisted shape, just unioned
    "ann_probe_sweep",
    # Same IVF centroid attach (vectors x broadcast 8-row centroid
    # set); the within-cluster pair scan itself is a list_id equi-join.
    "cluster_semantic_dedup",
    # The only NLJ left after the keyed-branch rewrite of the member
    # match (er/member_ingest.py) is the new-member id allocator's
    # crossJoin(broadcast(max(id))) — a 1-row scalar attach, the
    # standard distributed pattern for "next id past the dim's max".
    "ingest_member_service",
    # Corpus-statistics scalar attaches: crossJoin(broadcast(<1-row
    # aggregate>)) of (N, avgdl, per-term df) / (grand total, sqrt-sum
    # normalizer) onto the per-document/per-domain side — 1-row
    # broadcast, not a data-scale cartesian.
    "bm25_relevance",
    "corpus_mixture_weights",
    # same 1-row (n_docs, avgdl) stats attach on the index-served path
    "bm25_search_topk",
    # inherits corpus_mixture_weights' 1-row (grand, denom) attaches
    # through composition
    "corpus_epoch_sample",
    # same inheritance, through the dedup-aware composition (r9)
    "cluster_weighted_epoch",
    # same IVF centroid attach as knn_ivf, on the prefix build + the
    # frozen-centroid batch assignment (assign_to_centroids)
    "ann_ivf_append",
    # same centroid attach; the metadata filter itself is a row-local
    # predicate on the assignments side (r10)
    "ann_ivf_filtered",
    # composes the sqrt-lists IVF leg (centroid attach) with the
    # knn_bruteforce exact leg — both already-allowlisted shapes; the
    # measurement join itself is a (query_id, neighbor_id) equi-join
    "ann_recall_audit",
    # hybrid fusion: the BM25 leg's 1-row corpus-stats crossJoin plus
    # the vector leg's bounded-query-panel non-equi broadcast (the
    # knn_bruteforce shape); fusion itself is k-row outer joins (r10)
    "ann_hybrid_rrf",
    # frozen-centroid attach on BOTH generations (assign_to_centroids
    # twice); everything downstream is list_id-keyed aggregation (r10)
    "audit_embedding_drift",
    # IVFPQ: probe_lists' conditionless query x broadcast centroid
    # attach (index-sized, the knn_ivf shape) — the candidate join is
    # a list_id equi-join and ADC is a (sub_id, code_id) equi-join
    # against the broadcast per-query distance table (r11)
    "ann_ivfpq_topk",
    # same IVFPQ centroid attach; the re-rank stage is two broadcast
    # EQUI joins (shortlist ids -> raw vectors, query vectors) (r11)
    "ann_ivfpq_refine",
    # PQ leg: the bounded query-panel broadcast carrying each query's
    # constant-sized ADC distance table (r12 — the former (sub_id,
    # code_id) equi-join + per-pair fold became m direct lookups, so
    # the one join left is the panel attach, the knn_bruteforce shape);
    # the exact leg of the recall twin is the same bounded panel —
    # linear BY DESIGN, it IS the recall measurement (r11)
    "ann_pq_adc",
    "ann_pq_recall",
    # filtered twin of ann_recall_audit: centroid attach on the index
    # leg + the panel x filtered-corpus brute-force measurement leg;
    # the measurement join is a (query_id, neighbor_id) equi-join (r11)
    "ann_filtered_recall",
    # both legs are the bounded query-panel non-equi broadcast (the
    # knn_bruteforce shape): int8-code cosine and exact float cosine —
    # linear BY DESIGN, they ARE the recall measurement (r11)
    "ann_int8_recall",
    # grand-total crossJoin(broadcast(<1-row count>)) replacing the
    # former single-partition count(*) OVER () window (VERDICT r5 fix)
    "filter_null_coalesce",
    # FK-audit report row: crossJoin of TWO 1-row aggregates
    # (orphan count x child-row count) — scalar x scalar, not
    # data-scale (operators/audit.py audit_foreign_key)
    "constraint_quality_audit",
}

# Pipeline DataFrames whose only NLJ is a 1-row scalar attach
# (crossJoin(broadcast(<1-row aggregate>)) — max-stamp / next-id), the
# standard distributed pattern, not a data-scale cartesian.
ALLOW_NESTED_LOOP_PIPELINE = {
    "crawl2:session_days",  # crossJoin(broadcast(max(fetched_at))) day marker
    "crawl4:members",  # new-member id allocator crossJoin(broadcast(max(id)))
    "crawl4:service",  # downstream of the same allocator via member_map
    # the composed end-to-end epoch plan inherits the mixture algebra's
    # crossJoin(broadcast(<1-row (grand, denom) aggregate>)) scalar
    # attach (corpus_mixture_weights' allowlisted shape) — 1-row, not
    # data-scale (r10)
    "curate:epoch_plan",
}

HARD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def pipeline_plans(spark) -> list[tuple[str, object]]:
    """Build every pipeline job's pre-action DataFrame.

    Crawl stages run for real into a temp store (stages read each
    other's tables), with ``upsert_parquet`` wrapped to capture each
    DataFrame as handed to the sink.  ER and dump jobs are pure
    builders, captured directly over the snowflake fixture.
    """
    import tempfile

    from pyspark.sql import functions as F

    from palegislature_spark.er.vote_names import (
        backfill_member_ids,
        match_vote_names,
        roll_years,
    )
    from palegislature_spark.pipelines import crawl, dump
    from palegislature_spark.pipelines.ingest import stored_page_source
    from palegislature_spark.queries import er_fixtures
    from tests.test_crawl_job import PAGES, _url_of_day, _url_of_roll

    captured: list[tuple[str, object]] = []
    stage = ["crawl1"]
    real_upsert = crawl.upsert_parquet

    def capturing_upsert(spark_, path, df, keys, **kw):
        captured.append((f"{stage[0]}:{path.rsplit('/', 1)[-1]}", df))
        return real_upsert(spark_, path, df, keys, **kw)

    source = stored_page_source(PAGES)
    root = tempfile.mkdtemp(prefix="plan_audit_store_")
    crawl.upsert_parquet = capturing_upsert
    try:
        session_urls = spark.createDataFrame(
            [("https://x/SessionDays.cfm?Chamber=H",)], "url string"
        )
        crawl.run_sessions_stage(spark, root, session_urls, source)
        stage[0] = "crawl2"
        crawl.run_days_stage(spark, root, source, _url_of_day)
        stage[0] = "crawl3"
        crawl.run_rolls_stage(spark, root, source, _url_of_roll)
        stage[0] = "crawl4"
        member_urls = spark.createDataFrame(
            [("https://x/mbrList.cfm?body=H&SessYear=2019",)], "url string"
        )
        crawl.run_member_stage(spark, root, member_urls, source, chamber=1)
        stage[0] = "crawl5"
        bio_urls = spark.createDataFrame(
            [("https://x/bio.cfm?member_id=1&chamber=1",)], "url string"
        )
        crawl.run_bio_stage(spark, root, bio_urls, source)
    finally:
        crawl.upsert_parquet = real_upsert

    snow = er_fixtures.snowflake(spark)
    matches = match_vote_names(
        snow["votes"],
        snow["roll_calls"],
        snow["session_days"],
        snow["members"],
        snow["service"],
    )
    captured.append(("er:match_vote_names", matches))
    captured.append(
        (
            "er:backfill_member_ids",
            backfill_member_ids(
                snow["votes"],
                matches,
                roll_years(snow["roll_calls"], snow["session_days"]),
            ),
        )
    )

    ordered = dump.ordered_rolls(
        snow["sessions"], snow["session_days"], snow["roll_calls"]
    )
    columns = dump.matrix_columns(snow["members"], snow["service"])
    captured.append(("dump:ordered_rolls", ordered))
    captured.append(("dump:matrix_columns", columns))
    votes_filled = backfill_member_ids(
        snow["votes"], matches, roll_years(snow["roll_calls"], snow["session_days"])
    )
    matrix, _cols = dump.vote_matrix(votes_filled, ordered, columns, 2019, 1)
    captured.append(("dump:vote_matrix", matrix))

    # the composed end-to-end curation epoch plan (gate -> dedup ->
    # decontam -> mixture draw -> global shuffle -> packing), audited
    # as ONE plan over the sf0.001 documents table (r10)
    from palegislature_spark.catalog import load
    from palegislature_spark.operators.sampling import hash_split
    from palegislature_spark.pipelines.curate import curation_epoch_plan

    docs = hash_split(
        load(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    captured.append(
        (
            "curate:epoch_plan",
            curation_epoch_plan(
                docs.filter(F.col("split") != "test").drop("split"),
                docs.filter(F.col("split") == "test").drop("split"),
                budget=512,
            ),
        )
    )
    return captured


def audit_plan(plan: str) -> dict:
    return {
        "cartesian": "CartesianProduct" in plan,
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "py_row_udf": "BatchEvalPython" in plan,
        "py_arrow": bool(re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


AUDIT_ROWS: dict[str, dict] = {}


def audit_one(name: str, df, allow: set[str], allow_note: str) -> bool:
    """Audit one DataFrame's physical plan; print a row; True = fail."""
    try:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # codegen *(N) markers only appear in the simple-mode string
        simple = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name:32s} ERROR {type(e).__name__}: {e}")
        return True
    a = audit_plan(plan)
    a["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", simple)))
    flags = []
    if a["cartesian"]:
        flags.append("CARTESIAN")
    if a["bnlj"]:
        flags.append("BNLJ")
    if a["py_row_udf"]:
        flags.append("PY_ROW_UDF")
    if a["py_arrow"]:
        flags.append("arrow-udf")
    hard = [f for f in flags if f.isupper()]
    failed = bool(hard) and name not in allow
    status = ",".join(flags) if flags else "-"
    if name in allow and hard:
        status += f" (allowed: {allow_note})"
    print(
        f"{name:32s} {a['exchanges']:4d} {a['codegen_spans']:4d} "
        f"{a['pushed_filters']:4d}  {status}"
    )
    AUDIT_ROWS[name] = {
        "exchanges": a["exchanges"],
        "codegen_spans": a["codegen_spans"],
        "pushed_filters": a["pushed_filters"],
        "flags": flags,
        "allowed": name in allow and bool(hard),
        "failed": failed,
    }
    return failed


def main() -> int:
    # --json PATH writes the per-query audit table as a diffable
    # artifact (PLANAUDIT_r{N}.json), so exchange-count regressions —
    # a query suddenly growing a shuffle — show up round-over-round.
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from __spark_entry__ import queries
    from palegislature_spark.session import get_spark

    spark = get_spark("plan_audit")
    failures = []
    print(f"{'query':32s} {'xchg':>4s} {'wscg':>4s} {'push':>4s}  flags")
    for name, fn in queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:32s} ERROR {type(e).__name__}: {e}")
            continue
        if audit_one(name, df, ALLOW_NESTED_LOOP, "exact oracle"):
            failures.append(name)

    if not only:
        print(f"\n{'pipeline job':32s} {'xchg':>4s} {'wscg':>4s} {'push':>4s}  flags")
        for name, df in pipeline_plans(spark):
            if audit_one(
                name, df, ALLOW_NESTED_LOOP_PIPELINE, "1-row scalar attach"
            ):
                failures.append(name)

    if failures:
        print(f"\nFLAGGED: {sorted(failures)}")
    else:
        print("\nall plans clean")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "flagged": sorted(failures), "plans": AUDIT_ROWS},
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
