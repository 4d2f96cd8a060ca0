"""spark-submit entry point (north rule: `run via spark-submit --py-files`).

Usage:
    cd /root/repo && zip -qr /tmp/engine.zip unipdf_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        bench/submit_job.py [n_docs]

Renders a fixture corpus, runs extraction, prints one JSON line with
docs/sec + span-equality pass rate. The engine package arrives on executors
via --py-files only (no repo on sys.path).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from unipdf_spark import pipeline  # resolved from --py-files zip

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = SparkSession.builder.appName("unipdf-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    docs = pipeline.gen_docs_pdf(spark, n_docs, mix="bench").persist()
    docs.count()
    t0 = time.perf_counter()
    out = pipeline.run_extraction(docs)
    eq = pipeline.span_equality(docs, out)
    n_match = eq.filter(F.col("match")).count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_match": n_match,
                "pass_rate": n_match / n_docs,
                "docs_per_sec": round(n_docs / dt, 1),
                "via": "spark-submit --py-files",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
