import pytest

from unipdf_spark.fixtures import make_doc
from unipdf_spark.pdf.cos import Lexer, Name, PdfDocument, PdfError, Ref


def lex(b: bytes):
    return Lexer(b, 0).parse_object()


def test_scalars():
    assert lex(b"true") is True
    assert lex(b"false") is False
    assert lex(b"null") is None
    assert lex(b"42") == 42
    assert lex(b"-3.25") == -3.25
    assert lex(b"+.5") == 0.5


def test_name_with_hex_escape():
    assert lex(b"/Foo#20Bar") == Name("Foo Bar")


def test_literal_string_escapes():
    assert lex(rb"(a\(b\)c)") == b"a(b)c"
    assert lex(rb"(line\nnext)") == b"line\nnext"
    assert lex(rb"(\101\102)") == b"AB"
    assert lex(b"(nested (parens) ok)") == b"nested (parens) ok"


def test_hex_string():
    assert lex(b"<48656C6C6F>") == b"Hello"
    assert lex(b"<48 65 6>") == b"He`"  # odd digit padded with 0


def test_array_and_dict():
    assert lex(b"[1 2 /X (s) [3]]") == [1, 2, Name("X"), b"s", [3]]
    d = lex(b"<< /A 1 /B [2 3] /C << /D /E >> >>")
    assert d["A"] == 1 and d["B"] == [2, 3] and d["C"]["D"] == Name("E")


def test_reference_lookahead():
    assert lex(b"12 0 R") == Ref(12, 0)
    # not a reference: plain numbers in an array
    assert lex(b"[12 0 13]") == [12, 0, 13]
    assert lex(b"[12 0 R 13]") == [Ref(12, 0), 13]


def test_comment_skipped():
    assert lex(b"% comment\n7") == 7


def test_document_load_and_pages():
    _, pdf = make_doc("doc_cos_test", "simple")
    doc = PdfDocument(pdf)
    assert doc.trailer.get("Root") is not None
    pages = doc.pages()
    assert len(pages) == 1
    content = doc.page_content(pages[0])
    assert b"BT" in content and b"Tj" in content
    assert doc.media_box(pages[0]) == (0.0, 0.0, 612.0, 792.0)


def test_xref_repair_on_corrupt_startxref():
    _, pdf = make_doc("doc_cos_repair", "malformed")
    doc = PdfDocument(pdf)  # startxref points at offset 1 → repair scan
    assert len(doc.pages()) == 1


def test_strict_mode_raises_on_garbage():
    with pytest.raises(PdfError):
        PdfDocument(b"not a pdf at all", relaxed=False)
