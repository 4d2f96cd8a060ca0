"""Benchmark harness. Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "docs_per_sec": ..., "n_docs": ...}

Headline = span-extraction throughput over the rendered fixture corpus
(the north-rule workload: docs/sec + span-equality pass rate), plus the
analytics operator suite at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (override corpus size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def collect_violations(eq_df, tier: str, limit: int = 25) -> list[dict]:
    """Collect (and print to stderr) every span-equality failure in a tier.

    r9 shipped a 0→1 soak-error flip silently (span_equality_pass_rate
    0.99999 was in the artifact, but nothing named the failing doc or
    surfaced the flip); the north rule requires exactly 1.0, so ANY
    inequality is a hard violation the artifact must carry loudly. The
    returned dicts land in the top-level ``span_equality_violations``
    field; the stderr lines give a human the doc_id + error to reproduce
    with ``make_doc`` directly.

    `eq_df` is a pipeline.span_equality frame (doc_id, fixture_class,
    error, match); rows with match NULL (extraction produced no row at
    all) count as violations too.
    """
    from pyspark.sql import functions as F

    rows = (
        eq_df.filter(~F.coalesce(F.col("match"), F.lit(False)))
        .select("doc_id", "fixture_class", "error")
        .limit(limit)
        .collect()
    )
    out = []
    for r in rows:
        v = {
            "tier": tier,
            "doc_id": r["doc_id"],
            "fixture_class": r["fixture_class"],
            "error": r["error"],
        }
        out.append(v)
        print(
            f"SPAN EQUALITY VIOLATION [{tier}] {r['doc_id']} "
            f"({r['fixture_class']}): {r['error']!r}",
            file=sys.stderr,
        )
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from unipdf_spark import pipeline
    from unipdf_spark.operators import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_start = os.getloadavg()  # r4 VERDICT #4: detect loaded-host runs
    sf = 0.1
    if "0.001" in sf_dir:
        sf = 0.001
    elif "0.01" in sf_dir:
        sf = 0.01
    n_docs = int(os.environ.get("BENCH_N_DOCS", {0.001: 60, 0.01: 600}.get(sf, 6000)))
    # tier isolation (r9 VERDICT #3): BENCH_ONLY = "soak" | "integrated"
    # runs JUST that tier in this process, so a fresh-process launcher
    # (bench/isolated.py) can capture each latency-shaped tier at true
    # idle — the in-run loadavg of earlier tiers otherwise contaminates
    # the straggler/throughput numbers. Default "" = full run (the
    # driver's per-round contract, unchanged).
    only = os.environ.get("BENCH_ONLY", "")

    spark = pipeline.get_spark("unipdf-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    docs_per_sec = pass_rate = 0.0
    n_ok = 0
    violations: list[dict] = []  # any tier's span equality < 1.0 → entries

    # warm-up: python worker spawn + imports are one-time costs; pay them
    # outside every timed section (steady-state throughput is the metric)
    pipeline.gen_docs_pdf(spark, cpus * 8, mix="bench", partitions=cpus).count()

    if only == "":
        # --- headline: extraction throughput + span equality ---------------
        t0 = time.perf_counter()
        docs_pdf = pipeline.gen_docs_pdf(
            spark, n_docs, mix="bench", partitions=cpus * 2
        ).persist()
        docs_pdf.count()  # materialize generation outside the extract timing
        t_gen = time.perf_counter() - t0
        timings["fixture_generation"] = round(t_gen, 3)

        pipeline.run_extraction(docs_pdf.limit(cpus * 8)).count()  # warm-up
        # steady-state throughput: best of 2 full passes (same policy as the
        # query timings; pass 1 still pays residual JIT on the full mix)
        t0 = time.perf_counter()
        pipeline.run_extraction(docs_pdf, partitions=cpus * 2).filter(
            F.col("error").isNull()
        ).count()
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        spans_out = pipeline.run_extraction(
            docs_pdf, partitions=cpus * 2).persist()
        n_ok = spans_out.filter(F.col("error").isNull()).count()
        t_extract = min(t_first, time.perf_counter() - t0)
        timings["extract_spans"] = round(t_extract, 3)
        docs_per_sec = n_docs / t_extract if t_extract > 0 else 0.0

        t0 = time.perf_counter()
        eq = pipeline.span_equality(docs_pdf, spans_out)
        n_match = eq.filter(F.col("match")).count()
        timings["span_equality_join"] = round(time.perf_counter() - t0, 3)
        pass_rate = n_match / n_docs if n_docs else 0.0
        if n_match < n_docs:
            violations += collect_violations(eq, "headline")
        spans_out.unpersist()
        docs_pdf.unpersist()

        # --- analytics operator suite ---------------------------------------
        headline = [
            "q1_pricing_summary", "q3_shipping_priority",
            "q5_local_supplier_volume",
            "q6_forecast_revenue", "top_customers_per_segment",
            "events_sessionize",
            "token_counts", "quality_scores", "doc_fingerprints", "dedup_exact",
            "minhash_lsh_pairs", "simhash_fingerprints", "ann_bruteforce_topk",
            "embedding_near_dup_pairs",
            # r6: the integrated render→extract→reassemble→dedup pipeline and
            # the HTML boilerplate-strip leg
            "extracted_text_dedup", "html_main_content",
        ]
        # Per-query timing = steady-state (best of 2 back-to-back runs). The
        # first run of a plan shape pays one-time janino/JIT expression
        # compilation (measured ~7 s for the 32-family MinHash projection
        # REGARDLESS of data size: 8.0 s at 500 docs vs 1.5 s for 10x the
        # rows once compiled) — a per-executor constant that vanishes at
        # production scale. Cold first-run times are reported as
        # queries_cold.
        qs = all_queries()

        def _run(name: str) -> float:
            t0 = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                qs[name](spark, sf_dir).count()  # noop sink unavailable
            return time.perf_counter() - t0

        for name in headline:
            try:
                cold[name] = round(_run(name), 3)
                warm = _run(name)
                if warm > cold[name] * 0.98:
                    # warm ≈/≥ cold is the documented signature of concurrent
                    # host load (r4's BENCH artifact recorded 2× inflation);
                    # one retry gives the steady state a fair shot
                    warm = min(warm, _run(name))
                timings[name] = round(min(cold[name], warm), 3)
            except Exception as e:  # noqa: BLE001
                timings[name] = -1.0
                print(f"bench error {name}: {e}", file=sys.stderr)

    # --- 100k-doc full-mix soak tier (r5 VERDICT #8: the 6k headline is
    # mostly fixed overhead; the soak is the real throughput signal).
    # Default-on at sf0.1 (the driver's per-round config); BENCH_SOAK_DOCS
    # overrides (0 disables). Load-guarded like the headline: the loadavg
    # at soak start is recorded and flags the tier noisy.
    soak_default = 100000 if sf >= 0.1 else 0
    soak_n = int(os.environ.get("BENCH_SOAK_DOCS", soak_default))
    soak = None
    if soak_n > 0 and only in ("", "soak"):
        soak_load = os.getloadavg()
        t0 = time.perf_counter()
        soak_docs = pipeline.gen_docs_pdf(
            spark, soak_n, mix="default", partitions=cpus * 2
        ).persist()
        soak_docs.count()
        soak_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        s_out = pipeline.run_extraction(soak_docs).persist()
        s_err = s_out.filter(F.col("error").isNotNull()).count()
        soak_extract = time.perf_counter() - t0
        s_eq = pipeline.span_equality(soak_docs, s_out)
        s_match = s_eq.filter(F.col("match")).count()
        if s_match < soak_n:
            violations += collect_violations(s_eq, "soak")
        s_out.unpersist()
        soak_docs.unpersist()
        soak = {
            "n_docs": soak_n,
            "mix": "default_full",
            "generation_sec": round(soak_gen, 3),
            "extract_sec": round(soak_extract, 3),
            "docs_per_sec": round(soak_n / soak_extract, 1)
            if soak_extract > 0 else 0.0,
            "errors": s_err,
            "span_equality_pass_rate": round(s_match / soak_n, 6),
            "loadavg_start": [round(x, 2) for x in soak_load],
            # external-load signal = the PROCESS-start loadavg: by soak
            # time the 1-min average unavoidably carries this bench's own
            # just-finished query work
            "noisy": load_start[0] > 4.0,
        }

    # --- integrated-pipeline soak (r6 VERDICT #3): render → extract →
    # reassemble → MinHash/LSH at 100k docs with a planted ≥1 MB mega-doc.
    # The mega-doc exercises the oversized-doc split (bounded task atoms,
    # operators.extracted.render_extract_parts): as ONE task it would cost
    # ~15 s and push the straggler ratio past 2; as ~17 parallel parts the
    # per-partition work distribution stays flat. BENCH_INTEGRATED_DOCS
    # overrides (0 disables).
    int_default = 100000 if sf >= 0.1 else 0
    int_n = int(os.environ.get("BENCH_INTEGRATED_DOCS", int_default))
    integrated = None
    if int_n > 0 and only in ("", "integrated"):
        from unipdf_spark.operators.dedup import (
            MAX_BUCKET, band_table, minhash_signatures_pandas)
        from unipdf_spark.operators.extracted import (
            reassemble_parts, render_extract_parts)

        int_load = os.getloadavg()
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("bid"), "text")
        n_base = base.count()
        corpus = (
            spark.range(0, int_n, numPartitions=cpus * 2)
            .withColumn("bid", F.col("id") % n_base)
            .join(F.broadcast(base), "bid")
            .select(
                F.concat(F.lit("doc_"),
                         F.lpad(F.col("id").cast("string"), 8, "0")
                         ).alias("doc_id"),
                "text",
            )
        )
        btxt = base.limit(1).collect()[0]["text"]
        mega = (btxt + " ") * (1_100_000 // (len(btxt) + 1) + 1)
        mega_df = spark.createDataFrame(
            [(f"doc_{int_n:08d}", mega)], "doc_id string, text string")
        corpus = corpus.unionByName(mega_df)

        t0 = time.perf_counter()
        pe = render_extract_parts(corpus).persist()
        n_err = pe.filter(F.col("error").isNotNull()).count()
        t_int_extract = time.perf_counter() - t0
        per_part = (
            pe.groupBy("partition_id")
            .agg(F.sum("elapsed_ms").alias("ms"))
            .collect()
        )
        times = sorted(r["ms"] for r in per_part)
        med = times[len(times) // 2] if times else 0
        mx = times[-1] if times else 0

        t0 = time.perf_counter()
        ext = reassemble_parts(pe)
        bt = band_table(minhash_signatures_pandas(ext)).persist()
        ok = (
            bt.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter((F.col("n") >= 2) & (F.col("n") <= MAX_BUCKET))
            .select("band", "band_hash")
        )
        cand = (
            bt.join(ok, ["band", "band_hash"], "left_semi")
            .groupBy("band", "band_hash")
            .agg(F.collect_list("doc_id").alias("members"))
            .select(F.explode("members").alias("doc_a"), "members")
            .select("doc_a", F.explode("members").alias("doc_b"))
            .filter(F.col("doc_a") < F.col("doc_b"))
            .distinct()
        )
        n_pairs = cand.count()
        t_lsh = time.perf_counter() - t0
        bt.unpersist()
        pe.unpersist()
        integrated = {
            "n_docs": int_n + 1,
            "mega_doc_chars": len(mega),
            "extract_sec": round(t_int_extract, 3),
            "docs_per_sec": round((int_n + 1) / t_int_extract, 1)
            if t_int_extract > 0 else 0.0,
            "errors": n_err,
            "partitions": len(times),
            "median_partition_ms": int(med),
            "max_partition_ms": int(mx),
            "straggler_ratio": round((mx / med) if med else 0.0, 3),
            "lsh_sec": round(t_lsh, 3),
            "n_candidate_pairs": n_pairs,
            "loadavg_start": [round(x, 2) for x in int_load],
            "noisy": load_start[0] > 4.0,
        }

    load_end = os.getloadavg()
    # the host is "noisy" when load beyond this process's own footprint is
    # present at start (fresh runs start near-idle; a 1-min loadavg much
    # above the residual-decay band means something else is running) or
    # when warm==cold persisted across the retry on several queries
    warm_eq_cold = sum(
        1 for k in timings
        if k in cold and timings[k] > 0 and timings[k] >= cold[k] * 0.98
    )
    noisy = load_start[0] > 4.0 or warm_eq_cold >= 3
    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(
        json.dumps(
            {
                "metric": "extracted docs/sec + span-equality pass rate; "
                "headline operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "sf": sf,
                "n_docs": n_docs,
                "docs_per_sec": round(docs_per_sec, 1),
                "span_equality_pass_rate": round(pass_rate, 6),
                "extract_ok": n_ok,
                "cpus": cpus,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in load_end],
                "noisy": noisy,
                # empty list == every tier at exactly 1.0 (the north-rule
                # requirement); any entry here means the round is NOT clean
                "span_equality_violations": violations,
                "soak": soak,
                "integrated_soak": integrated,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
