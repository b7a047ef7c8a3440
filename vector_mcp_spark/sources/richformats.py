"""Pure-stdlib rich-format text extraction: docx, epub, and simple PDFs.

The reference ingests these via llama-index ``SimpleDirectoryReader``
(``vector_mcp/vector_api.py:319-366``, deps ``pyproject.toml:12``). No
parser libraries exist in this container, but the formats themselves are
tractable without them:

- ``.docx`` is a zip of OOXML — paragraphs are ``w:p`` elements, text runs
  are ``w:t`` (stdlib ``zipfile`` + ``xml.etree``).
- ``.epub`` is a zip of XHTML chapters — same tag-strip as the html reader.
- ``.pdf`` stores page content as (usually Flate-compressed) streams of
  text operators; ``zlib`` + the ``Tj``/``TJ``/``'`` operator grammar
  recovers the text of simple, unencrypted PDFs.

These are honest *basic* extractors (no styles, no reading-order repair, no
embedded fonts/CMaps, no encryption) — full-fidelity parsing still belongs
to a real library; encrypted or undecodable inputs raise
``NotImplementedError`` at the same seam. Extraction runs inside the
Arrow-batched decode UDF (``readers.py``), so bytes stay executor-side.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t]+")

# PDF literal strings ``(...) Tj``, array form ``[...] TJ`` and the
# next-line show operator ``'``; strings may contain balanced escaped parens
_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PDF_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_PDF_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')|\[((?:[^\]\\]|\\.)*)\]\s*TJ")
_PDF_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def decode_docx(data: bytes) -> str:
    """OOXML main document part → one line per paragraph."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml_bytes = z.read("word/document.xml")
    root = ElementTree.fromstring(xml_bytes)
    paras = []
    for p in root.iter(f"{_W_NS}p"):
        runs = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t" and node.text:
                runs.append(node.text)
            elif node.tag in (f"{_W_NS}tab",):
                runs.append("\t")
            elif node.tag in (f"{_W_NS}br", f"{_W_NS}cr"):
                runs.append("\n")
        paras.append("".join(runs))
    return "\n".join(paras).strip()


def decode_epub(data: bytes) -> str:
    """Concatenate tag-stripped XHTML chapters (archive order — spine-order
    repair via content.opf is a fidelity upgrade a real lib would do)."""
    out = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for name in z.namelist():
            if name.lower().endswith((".xhtml", ".html", ".htm")):
                html = z.read(name).decode("utf-8", errors="replace")
                out.append(_WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip())
    return "\n".join(t for t in out if t).strip()


def _pdf_unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop the backslash
            continue
        out += c
        i += 1
    return bytes(out)


def decode_pdf(data: bytes) -> str:
    """Text of a simple, unencrypted PDF: inflate content streams, walk
    BT..ET blocks, collect Tj / ' / TJ show operators."""
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDF requires a real parser library")
    pieces: list[str] = []
    for m in _PDF_STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw  # uncompressed content stream
        for block in _PDF_TEXT_BLOCK_RE.finditer(content):
            for show in _PDF_SHOW_RE.finditer(block.group(1)):
                if show.group(1) is not None:
                    pieces.append(_pdf_unescape(show.group(1)).decode("latin-1"))
                else:  # TJ array: strings interleaved with kerning numbers
                    for s in _PDF_ARRAY_STR_RE.finditer(show.group(2)):
                        pieces.append(_pdf_unescape(s.group(1)).decode("latin-1"))
            pieces.append("\n")
    text = "".join(pieces).strip()
    if not text:
        # no streams, image-only pages, exotic filters, CMap-encoded fonts —
        # refuse loudly rather than silently return nothing
        raise NotImplementedError("PDF text extraction failed; requires a parser library")
    return text
