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
  recovers the text. The object layer is parsed structurally — indirect
  objects are scanned directly (so classic xref tables AND PDF 1.5
  cross-reference streams both work without decoding the index), object
  streams (/Type /ObjStm) are expanded, and text comes from the page
  tree's /Contents in page order, literal and hex strings alike.

These are honest *basic* extractors (no styles, no reading-order repair, no
embedded fonts/CMaps) — full-fidelity parsing still belongs to a real
library; encrypted inputs, image-only pages, and exotic filters raise
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

# PDF literal strings ``(...) Tj``, hex strings ``<...> Tj``, array form
# ``[...] TJ`` and the next-line show operator ``'``; literal strings may
# contain balanced escaped parens
_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PDF_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_PDF_SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')"
    rb"|<([0-9A-Fa-f\s]*)>\s*(?:Tj|')"
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ"
)
_PDF_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>")
# top-level indirect objects are self-delimiting: ``N G obj ... endobj``.
# Scanning them directly makes the extractor independent of HOW the file
# indexes its objects — classic xref tables and PDF 1.5 cross-reference
# STREAMS both just point at these, so neither needs decoding.
_PDF_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_PDF_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
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


_A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def decode_pptx(data: bytes) -> str:
    """PresentationML slides → one line per paragraph, slides in numeric
    order (``ppt/slides/slide<N>.xml`` — N is the slide sequence). Same
    stdlib zip+ElementTree approach as docx: text runs are DrawingML
    ``a:t`` elements grouped into ``a:p`` paragraphs. The reference gets
    pptx free from llama-index SimpleDirectoryReader (pyproject.toml:12)."""
    slides: list[tuple[int, bytes]] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for name in z.namelist():
            m = _SLIDE_RE.match(name)
            if m:
                slides.append((int(m.group(1)), z.read(name)))
    paras: list[str] = []
    for _, xml_bytes in sorted(slides):
        root = ElementTree.fromstring(xml_bytes)
        for p in root.iter(f"{_A_NS}p"):
            runs = [node.text for node in p.iter(f"{_A_NS}t") if node.text]
            if runs:
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


def _pdf_hex_str(raw: bytes) -> bytes:
    """PDF hex string body → bytes (whitespace allowed; odd length pads 0)."""
    h = re.sub(rb"\s+", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _pdf_show_text(content: bytes, pieces: list[str]) -> None:
    """Collect the show-operator strings of one content stream."""
    for block in _PDF_TEXT_BLOCK_RE.finditer(content):
        for show in _PDF_SHOW_RE.finditer(block.group(1)):
            if show.group(1) is not None:
                pieces.append(_pdf_unescape(show.group(1)).decode("latin-1"))
            elif show.group(2) is not None:
                pieces.append(_pdf_hex_str(show.group(2)).decode("latin-1"))
            else:  # TJ array: strings interleaved with kerning numbers
                for s in _PDF_ARRAY_STR_RE.finditer(show.group(3)):
                    if s.group(1) is not None:
                        pieces.append(_pdf_unescape(s.group(1)).decode("latin-1"))
                    else:
                        pieces.append(_pdf_hex_str(s.group(2)).decode("latin-1"))
        pieces.append("\n")


def _pdf_inflate(obj_dict: bytes, stream: bytes) -> bytes:
    """Decode one stream body: FlateDecode or unfiltered; anything else
    (LZW, DCT images, ...) yields b'' and is skipped by the caller."""
    if b"/FlateDecode" in obj_dict:
        try:
            return zlib.decompress(stream)
        except zlib.error:
            return b""
    if b"/Filter" in obj_dict:
        return b""
    return stream


def _pdf_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """All indirect objects as {num: (dict_bytes, stream_bytes|None)},
    including objects packed inside PDF 1.5 object streams (/Type /ObjStm):
    each ObjStm is inflated and its ``N`` (objnum, offset) header pairs are
    sliced back out as first-class dict-only objects. Cross-reference
    streams (/Type /XRef) need no decoding — they only index byte offsets
    this scan already recovers."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _PDF_OBJ_RE.finditer(data):
        body = m.group(2)
        sm = _PDF_STREAM_RE.search(body)
        if sm:
            objects[int(m.group(1))] = (body[: sm.start()], sm.group(1))
        else:
            objects[int(m.group(1))] = (body, None)
    for d, s in list(objects.values()):
        if b"/ObjStm" not in d or s is None:
            continue
        content = _pdf_inflate(d, s)
        n_m = re.search(rb"/N\s+(\d+)", d)
        first_m = re.search(rb"/First\s+(\d+)", d)
        if not content or not n_m or not first_m:
            continue
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = content[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = [(int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)]
        for i, (num, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < n else len(content)
            # packed objects are dict/array values only (streams can't nest)
            objects.setdefault(num, (content[first + off : end], None))
    return objects


def _pdf_page_order(objects: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """Page object numbers in page-tree order: /Type /Catalog → /Pages →
    depth-first /Kids walk (ADVICE r6: object-number order reverses pages
    when a writer emits Kids out of numeric order). Falls back to ascending
    object number when the tree is missing or malformed."""
    numeric = [n for n in sorted(objects)
               if re.search(rb"/Type\s*/Page\b", objects[n][0])]
    catalog = next(
        (d for d, _ in objects.values() if re.search(rb"/Type\s*/Catalog\b", d)), None
    )
    if catalog is None:
        return numeric
    pages_ref = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", catalog)
    if not pages_ref:
        return numeric
    order: list[int] = []
    seen: set[int] = set()  # cycle guard — a malformed tree must not hang decode
    # iterative depth-first walk: an adversarially deep Kids chain must not
    # blow Python's recursion limit and abort the whole ingest job over one
    # bad file (the fallback below still recovers the pages)
    stack = [int(pages_ref.group(1))]
    while stack:
        num = stack.pop()
        if num in seen or num not in objects:
            continue
        seen.add(num)
        d, _ = objects[num]
        if re.search(rb"/Type\s*/Page\b", d):
            order.append(num)
            continue
        kids = re.search(rb"/Kids\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]", d)
        if kids:
            # push in reverse so pop() visits Kids in document order
            for ref in reversed(_PDF_REF_RE.findall(kids.group(1))):
                stack.append(int(ref))
    # a partial tree (some pages unreachable) falls back rather than drop text
    return order if sorted(order) == numeric else numeric


def decode_pdf(data: bytes) -> str:
    """Text of an unencrypted PDF: walk the object graph (classic-xref,
    cross-reference-stream, and ObjStm layouts all work — objects are
    scanned directly, compressed object streams are expanded), inflate the
    page /Contents streams in /Root→/Pages→/Kids page-tree order, collect
    Tj / ' / TJ show operators (literal and hex strings). Files without a
    parseable page tree fall back to scanning every stream."""
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDF requires a real parser library")
    objects = _pdf_objects(data)
    pieces: list[str] = []
    seen_contents = False
    for num in _pdf_page_order(objects):
        d, _ = objects[num]
        c = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
        if not c:
            continue
        for ref in _PDF_REF_RE.findall(c.group(1)):
            obj = objects.get(int(ref))
            if obj and obj[1] is not None:
                seen_contents = True
                _pdf_show_text(_pdf_inflate(obj[0], obj[1]), pieces)
    if not seen_contents:
        # no parseable page tree (malformed / exotic writer): scan every
        # stream like the pre-graph extractor did
        for m in _PDF_STREAM_RE.finditer(data):
            raw = m.group(1)
            try:
                content = zlib.decompress(raw)
            except zlib.error:
                content = raw  # uncompressed content stream
            _pdf_show_text(content, pieces)
    text = "".join(pieces).strip()
    if not text:
        # image-only pages, exotic filters, CMap-encoded fonts — refuse
        # loudly rather than silently return nothing
        raise NotImplementedError("PDF text extraction failed; requires a parser library")
    return text


def decode_ipynb(data: bytes) -> str:
    """Jupyter notebook text: markdown/code cell sources plus plain-text
    outputs, blank-line separated (the reference inherits ``.ipynb`` from
    llama-index ``SimpleDirectoryReader``, ``vector_mcp/pyproject.toml:12``).
    Handles nbformat 4 (``cells``) and the legacy v3 layout (``worksheets``,
    code source under ``input``)."""
    import json

    nb = json.loads(data.decode("utf-8", errors="replace"))
    cells = nb.get("cells")
    if cells is None:  # nbformat <= 3
        cells = [c for ws in nb.get("worksheets", []) for c in ws.get("cells", [])]
    parts: list[str] = []

    def _join(v) -> str:
        return "".join(v) if isinstance(v, list) else str(v or "")

    for cell in cells:
        src = _join(cell.get("source", cell.get("input", "")))
        if src.strip():
            parts.append(src.strip())
        for out in cell.get("outputs") or []:
            txt = out.get("text")
            if txt is None:
                txt = (out.get("data") or {}).get("text/plain")
            txt = _join(txt)
            if txt.strip():
                parts.append(txt.strip())
    return "\n\n".join(parts)


_MBOX_FROM_RE = re.compile(rb"(?:^|\r?\n)From [^\n]*\r?\n")
_MBOX_UNESCAPE_RE = re.compile(r"^>(>*From )", re.MULTILINE)


def decode_mbox(data: bytes) -> str:
    """RFC 4155 mbox: one text block per message — Subject/From/To/Date
    headers plus every text/plain body part, parsed by the stdlib email
    package (llama-index ``MboxReader`` parity). Messages are delimited by
    ``From `` separator lines at line start; conforming writers escape body
    occurrences as ``>From``, so the split is unambiguous — and that
    escaping is REVERSED here (one ``>`` stripped from ``^>+From `` lines)
    so the extracted text matches what the sender wrote."""
    import email
    from email.policy import default as _email_default

    blocks: list[str] = []
    for chunk in _MBOX_FROM_RE.split(data):
        if not chunk.strip():
            continue
        msg = email.message_from_bytes(chunk, policy=_email_default)
        lines = [f"{h}: {msg[h]}" for h in ("Subject", "From", "To", "Date") if msg[h]]
        for part in msg.walk():
            if part.get_content_type() != "text/plain":
                continue
            try:
                body = part.get_content()
            except Exception:  # undecodable charset/transfer-encoding
                payload = part.get_payload(decode=True)
                body = payload.decode("utf-8", "replace") if payload else ""
            if body and body.strip():
                lines.append(_MBOX_UNESCAPE_RE.sub(r"\1", body.strip()))
        if lines:
            blocks.append("\n".join(lines))
    return "\n\n".join(blocks)
