"""Dump `.explain("formatted")` for every suite query into plans/r11/.

Usage: python tools/dump_plans_r11.py <suffix>
   e.g. python tools/dump_plans_r11.py before   → plans/r11/<query>_before.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"

# the bench.py headline suite (the set the driver times)
QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "top_customers_per_segment", "events_sessionize",
    "token_counts", "quality_scores", "doc_fingerprints", "dedup_exact",
    "minhash_lsh_pairs", "simhash_fingerprints", "ann_bruteforce_topk",
    "embedding_near_dup_pairs", "extracted_text_dedup", "html_main_content",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from unipdf_spark.operators import all_queries
    from unipdf_spark.pipeline import get_spark
    from unipdf_spark.plans import explain_str

    spark = get_spark("plans-r11", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs("plans/r11", exist_ok=True)
    for name in QUERIES:
        try:
            df = qs[name](spark, SF)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {e}"
        with open(f"plans/r11/{name}_{suffix}.txt", "w") as f:
            f.write(txt)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
