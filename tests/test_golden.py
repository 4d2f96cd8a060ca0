"""Golden-sidecar guards: the committed golden/*.parquet files must match a
fresh fixture-side regeneration (pure functions of seed/doc-index), and the
fixture-intended values must agree with what the engine actually extracts
on a spot-check (the full-corpus agreement is the driver oracle's job)."""

import pyarrow.parquet as pq
import pytest

from unipdf_spark.fixtures import gen, golden


@pytest.mark.parametrize("name", sorted(golden.SIDECARS))
def test_committed_sidecar_matches_regeneration(name):
    fresh = golden.build_table(name)
    committed = pq.read_table(f"golden/{name}.parquet")
    assert committed.schema.equals(fresh.schema), name
    assert committed.equals(fresh), (
        f"{name}: committed sidecar is stale — rerun tools/gen_golden.py"
    )


def test_table_cells_golden_agrees_with_engine_spot_check():
    from unipdf_spark.pdf.extract import extract_tables

    rows = golden.table_cells_rows()
    by_doc: dict[str, list] = {}
    for doc_id, tid, r, c, cell in rows:
        by_doc.setdefault(doc_id, []).append((tid, r, c, cell))
    classes = dict(golden.corpus_classes(
        golden.TABLE_CELLS_N, golden.TABLE_CELLS_MIX))
    # spot-check the first doc of each fixture class (incl. a merged-cell
    # gridtable if one is in the corpus)
    seen: set[str] = set()
    for doc_id, cls in classes.items():
        if cls in seen:
            continue
        seen.add(cls)
        _, pdf = gen.make_doc(doc_id, cls, 42)
        got = [
            (ti, r, c, cell)
            for ti, t in enumerate(extract_tables(pdf))
            for r, rowvals in enumerate(t["cells"])
            for c, cell in enumerate(rowvals)
        ]
        assert sorted(got) == sorted(by_doc[doc_id]), (doc_id, cls)


def test_spans_flat_golden_covers_all_docs():
    rows = golden.spans_flat_rows()
    doc_ids = {r[0] for r in rows}
    assert len(doc_ids) == golden.SPANS_FLAT_N
    # offsets are the running char position of the golden span stream
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r[1])
        pos = 0
        for _d, _i, kind, text_len, _m, offset in rs:
            assert offset == pos, doc_id
            pos += text_len


def test_every_sidecar_oracle_is_wired_and_exists():
    """Consistency guard: each golden sidecar has a committed parquet AND
    an oracle_sql entry referencing it; every referenced path exists."""
    import os
    import re
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as em

    oracles = em.oracle_sql()
    for name in golden.SIDECARS:
        assert os.path.exists(f"golden/{name}.parquet"), name
        assert name in oracles, f"{name} sidecar has no oracle entry"
        assert f"golden/{name}.parquet" in oracles[name], name
    # and every golden path any oracle references exists on disk
    for name, sql in oracles.items():
        for path in re.findall(r"'(/root/repo/golden/[^']+)'", sql):
            assert os.path.exists(path), (name, path)


def test_table_cell_goldens_property_random_ids():
    """Property: for ANY doc id, the planted cell matrix (including the
    merged-cell variant's top-left anchoring) equals what the engine
    extracts — the sidecar's guarantee is not specific to the committed
    40-doc corpus."""
    from unipdf_spark.pdf.extract import extract_tables

    for i in range(25):
        doc_id = f"prop_cells_{i:04d}"
        for cls in ("gridtable", "wstable", "twotables"):
            plan = gen._plan_doc(doc_id, cls, 42)
            want = [
                (tid, r, c, cell)
                for tid in sorted(plan.table_cell_goldens)
                for r, row in enumerate(plan.table_cell_goldens[tid])
                for c, cell in enumerate(row)
            ]
            _, pdf = gen.make_doc(doc_id, cls, 42)
            got = [
                (ti, r, c, cell)
                for ti, t in enumerate(extract_tables(pdf))
                for r, row in enumerate(t["cells"])
                for c, cell in enumerate(row)
            ]
            assert got == want, (doc_id, cls)


def test_media_decode_corpus_covers_every_jpeg_coding_path():
    """Coverage guard: the media_decode corpus must keep exercising every
    JPEG coding path (baseline, progressive, DRI restarts, 12-bit
    extended, lossless, and all three color subsamplings) — a mix change
    that silently drops one would weaken the value oracle."""
    modes: set[str] = set()
    subs: set[str] = set()
    for doc_id, cls in golden.corpus_classes(
            golden.MEDIA_DECODE_N, golden.MEDIA_DECODE_MIX):
        if cls != "jpeg_blocky":
            continue
        plan = gen._plan_doc(doc_id, cls, 42)
        for key in plan.jpeg_images:
            m = plan.jpeg_modes.get(key, "baseline")
            modes.add("restart" if m.startswith("restart")
                      else ("lossless" if m.startswith("lossless") else m))
        for _k, (_img, sub) in plan.jpeg_color_images.items():
            subs.add(sub)
    assert modes >= {"baseline", "progressive", "restart", "ext12",
                     "lossless"}, modes
    assert subs == {"444", "420", "411"}, subs
