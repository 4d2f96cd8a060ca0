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
