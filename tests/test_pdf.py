"""Stdlib PDF extraction (engine/pdf.py) on hermetically generated PDFs.

The reference's fixture corpus is PDF-only (sample/docs/rag/*.pdf,
ingested via PyPDF2 — rag/document_processor.py:15); this environment has
no PDF library, so the fallback extractor must handle the common
Flate-content-stream case. Fixtures are built in-test so the suite stays
hermetic.
"""

import zlib

import pytest

from optimized_rag_tpu.engine.documents import DocumentProcessor
from optimized_rag_tpu.engine.pdf import extract_pdf_text


def _minimal_pdf(content: bytes, extra_objects: bytes = b"",
                 compress: bool = True) -> bytes:
    """One-page PDF with the given content stream (optionally Flate)."""
    if compress:
        data = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        data, filt = content, b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << " + filt + b"/Length " + str(len(data)).encode()
        + b" >> stream\n" + data + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> "
        b"endobj",
    ]
    body = b"%PDF-1.4\n" + b"\n".join(objs) + extra_objects \
        + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    return body


def test_flate_literal_string(tmp_path):
    pdf = _minimal_pdf(
        b"BT /F1 12 Tf 72 700 Td (Hello RAG world) Tj ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    assert "Hello RAG world" in extract_pdf_text(str(p))


def test_uncompressed_tj_array_kerning(tmp_path):
    content = (b"BT /F1 12 Tf 72 700 Td "
               b"[(Hyb)-7(rid)-280(retrieval)] TJ ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(_minimal_pdf(content, compress=False))
    text = extract_pdf_text(str(p))
    # small kern joins, large kern becomes a word gap
    assert "Hybrid retrieval" in text


def test_escapes_and_multiline(tmp_path):
    content = (rb"BT /F1 12 Tf (line \(one\)) Tj 0 -14 Td "
               rb"(line two \\ done) Tj ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(_minimal_pdf(content))
    text = extract_pdf_text(str(p))
    assert "line (one)" in text
    assert "line two \\ done" in text
    assert text.index("one") < text.index("two")


def test_tounicode_cmap_hex_strings(tmp_path):
    """Subset fonts address glyphs by 2-byte CIDs; only the /ToUnicode
    CMap makes them readable — the LaTeX-PDF case."""
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"3 beginbfchar\n"
            b"<0001> <0054>\n<0002> <0050>\n<0003> <0055>\n"
            b"endbfchar\nend")
    cdata = zlib.compress(cmap)
    extra = (b"\n6 0 obj << /Filter /FlateDecode /Length "
             + str(len(cdata)).encode() + b" >> stream\n" + cdata
             + b"\nendstream endobj"
             b"\n7 0 obj << /Type /Font /Subtype /Type0 "
             b"/ToUnicode 6 0 R >> endobj")
    content = b"BT /F2 10 Tf <000100020003> Tj ET"
    pdf = _minimal_pdf(content, extra_objects=extra)
    # register F2 -> 7 0 R in a font resource dict
    pdf = pdf.replace(b"/Font << /F1 5 0 R >>",
                      b"/Font << /F1 5 0 R /F2 7 0 R >>")
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    assert "TPU" in extract_pdf_text(str(p))


def test_bfrange_mapping(tmp_path):
    cmap = (b"1 beginbfrange\n<0010> <0012> <0041>\nendbfrange\n")
    cdata = zlib.compress(cmap)
    extra = (b"\n6 0 obj << /Filter /FlateDecode /Length "
             + str(len(cdata)).encode() + b" >> stream\n" + cdata
             + b"\nendstream endobj"
             b"\n7 0 obj << /Type /Font /ToUnicode 6 0 R >> endobj")
    content = b"BT /F2 10 Tf <001000110012> Tj ET"
    pdf = _minimal_pdf(content, extra_objects=extra).replace(
        b"/Font << /F1 5 0 R >>", b"/Font << /F2 7 0 R >>")
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    assert "ABC" in extract_pdf_text(str(p))


def test_binary_streams_skipped(tmp_path):
    """Image data containing stray 'BT'/'Tj' bytes must not pollute the
    text (observed on real PDFs)."""
    noise = bytes(range(256)) * 8 + b"BT binary Tj garbage"
    ndata = zlib.compress(noise)
    extra = (b"\n8 0 obj << /Filter /FlateDecode /Subtype /Image /Length "
             + str(len(ndata)).encode() + b" >> stream\n" + ndata
             + b"\nendstream endobj")
    pdf = _minimal_pdf(b"BT /F1 12 Tf (clean text) Tj ET",
                       extra_objects=extra)
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    text = extract_pdf_text(str(p))
    assert "clean text" in text
    assert "garbage" not in text


def test_no_text_raises(tmp_path):
    p = tmp_path / "t.pdf"
    p.write_bytes(b"%PDF-1.4\nnothing here\n%%EOF")
    with pytest.raises(ValueError):
        extract_pdf_text(str(p))


def test_document_processor_pdf_fallback(tmp_path):
    """End-to-end: DocumentProcessor ingests a PDF with zero PDF deps."""
    p = tmp_path / "doc.pdf"
    p.write_bytes(_minimal_pdf(
        b"BT /F1 12 Tf (Retrieval augmented generation on TPU hardware "
        b"uses fused kernels.) Tj ET"))
    out = DocumentProcessor().process_file(str(p))
    joined = " ".join(c["text"] if isinstance(c, dict) else str(c)
                      for c in out.get("chunks", [])) + str(out)
    assert "fused kernels" in joined or "fused kernels" in str(out)


def test_tm_line_breaks_and_dehyphenation(tmp_path):
    """LaTeX-class writers break lines with Tm (not Td): without a break
    the last word of a line glues onto the first of the next
    ("Integrationin" — observed on the reference's dw-grpo.pdf), and a
    hyphenated wrap ("adap-" / "tive") must re-join."""
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 53.8 696.4 Tm [(Hierarchical)-250(Integration)] TJ "
               b"1 0 0 1 207.6 676.4 Tm [(in)-250(Relevance)] TJ "
               b"1 0 0 1 53.8 656.4 Tm (adap-) Tj "
               b"1 0 0 1 53.8 636.4 Tm (tive retrieval) Tj "
               b"ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(_minimal_pdf(content, compress=False))
    text = extract_pdf_text(str(p))
    assert "Integrationin" not in text          # Tm y-change = line break
    assert "Integration" in text and "in Relevance" in text
    assert "adaptive retrieval" in text         # de-hyphenated across wrap


def test_objstm_differences_encoding(tmp_path):
    """Fonts parked in a compressed object stream (/ObjStm) with a
    /Differences re-encoding must decode through the glyph-name table —
    the reference's system1-system2.pdf case, where missing ObjStm
    support rendered 'fi' as 'Þ' and apostrophes as 'Õ'."""
    # Object 7: font using encoding object 8; both live ONLY inside the
    # ObjStm (no top-level `7 0 obj`).
    font_obj = b"<< /Type /Font /Subtype /Type1 /Encoding 8 0 R >>"
    enc_obj = (b"<< /Type /Encoding /Differences "
               b"[ 2 /fi 39 /quoteright 97 /a/b/c/d/e/f/g/h/i ] >>")
    header = b"7 0 8 " + str(len(font_obj) + 1).encode()
    first = len(header) + 1
    objstm_payload = header + b"\n" + font_obj + b"\n" + enc_obj
    zdata = zlib.compress(objstm_payload)
    extra = (b"\n9 0 obj << /Type /ObjStm /N 2 /First "
             + str(first).encode() + b" /Filter /FlateDecode /Length "
             + str(len(zdata)).encode() + b" >> stream\n" + zdata
             + b"\nendstream endobj")
    # "\002gure" -> "figure" (code 2 = fi), "it\047s" -> "it's"
    content = b"BT /F2 10 Tf (a \002gure and it\047s deep) Tj ET"
    pdf = _minimal_pdf(content, extra_objects=extra).replace(
        b"/Font << /F1 5 0 R >>", b"/Font << /F2 7 0 R >>")
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    text = extract_pdf_text(str(p))
    assert "a figure and it’s deep" in text


def test_hyphen_rejoin_after_differences(tmp_path):
    """Hyphenated wrap whose first half ends in a re-encoded ligature
    ("signi\002-" / "cantly") must still re-join after decoding."""
    enc_obj = b"<< /Type /Encoding /Differences [ 2 /fi ] >>"
    font_obj = b"<< /Type /Font /Subtype /Type1 /Encoding 8 0 R >>"
    header = b"7 0 8 " + str(len(font_obj) + 1).encode()
    first = len(header) + 1
    payload = header + b"\n" + font_obj + b"\n" + enc_obj
    zdata = zlib.compress(payload)
    extra = (b"\n9 0 obj << /Type /ObjStm /N 2 /First "
             + str(first).encode() + b" /Filter /FlateDecode /Length "
             + str(len(zdata)).encode() + b" >> stream\n" + zdata
             + b"\nendstream endobj")
    content = (b"BT /F2 10 Tf (signi\002-) Tj 0 -12 Td (cantly less) Tj ET")
    pdf = _minimal_pdf(content, extra_objects=extra).replace(
        b"/Font << /F1 5 0 R >>", b"/Font << /F2 7 0 R >>")
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    assert "significantly less" in extract_pdf_text(str(p))


def test_line_break_ops_do_not_stack_blank_lines(tmp_path):
    """ET + BT + Td per visual line must not produce '\\n\\n' between
    consecutive wrapped lines — downstream chunkers treat blank lines as
    paragraph boundaries and truncate sentences at wrap points."""
    content = (b"BT /F1 12 Tf 72 700 Td (alpha beta) Tj ET "
               b"BT /F1 12 Tf 72 686 Td (gamma delta) Tj ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(_minimal_pdf(content, compress=False))
    text = extract_pdf_text(str(p))
    assert "alpha beta" in text and "gamma delta" in text
    assert "\n\n" not in text[text.index("alpha"):text.index("delta")]


def test_tm_same_y_does_not_split_words(tmp_path):
    """A same-y Tm (mid-line font switch / kerning reposition) must NOT
    insert a break inside a word."""
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 53.8 696.4 Tm (speci) Tj "
               b"1 0 0 1 80.0 696.4 Tm (fically) Tj ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(_minimal_pdf(content, compress=False))
    assert "specifically" in extract_pdf_text(str(p))


def test_tm_superscript_shift_does_not_split_word(tmp_path):
    """A small Tm y-shift (superscript/footnote marker, typically a
    third of the font size, often after switching to a SMALLER font)
    must stay on the same line — only shifts ~half the line's font size
    break lines."""
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 53.8 696.4 Tm (model) Tj "
               b"/F1 6.97 Tf 1 0 0 1 85.0 699.9 Tm (2) Tj "
               b"/F1 12 Tf 1 0 0 1 92.0 696.4 Tm (next) Tj "
               b"1 0 0 1 53.8 682.0 Tm (line two) Tj ET")
    p = tmp_path / "t.pdf"
    p.write_bytes(_minimal_pdf(content, compress=False))
    text = extract_pdf_text(str(p))
    assert "model2" in text            # superscript stays in the word
    assert "model\n2" not in text
    assert "line two" in text          # real leading still breaks the
    assert "nextline" not in text      # line (de-wrap may join w/ space)
