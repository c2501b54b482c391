"""Minimal dependency-free PDF writer for the date reports (K4).

The reference shells out weasyprint to turn the jinja2 HTML into a PDF
(ref eodatadowndatereports.py:134-258).  weasyprint (and its cairo/pango
stack) isn't installable here, so this module emits the report as a real,
valid PDF directly: PDF 1.4, Helvetica, one content stream per page,
uncompressed streams (so the text is greppable in tests), correct xref
table.  It intentionally supports exactly what the date report needs —
pages of monospaced-layout text lines with an emphasized title — and
nothing more; a deployment with weasyprint available still gets the full
HTML+CSS rendering path (datereports.html_to_pdf prefers it).
"""

from __future__ import annotations

PAGE_W, PAGE_H = 612, 792  # US Letter, points
MARGIN = 72
LEADING = 14
BODY_SIZE = 10
TITLE_SIZE = 16


def _esc(text: str) -> str:
    """Escape a string for a PDF literal; non-latin-1 chars degrade to '?'
    (the base-14 Helvetica font has no wider encoding)."""
    out = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return out.encode("latin-1", errors="replace").decode("latin-1")


def _page_stream(lines: list[tuple[str, int, bool]]) -> bytes:
    """Content stream: each entry is (text, font_size, bold)."""
    parts = ["BT", f"1 0 0 1 {MARGIN} {PAGE_H - MARGIN} Tm"]
    for text, size, bold in lines:
        font = "/F2" if bold else "/F1"
        parts.append(f"{font} {size} Tf")
        parts.append(f"0 {-max(LEADING, size + 4)} Td")
        parts.append(f"({_esc(text)}) Tj")
    parts.append("ET")
    return "\n".join(parts).encode("latin-1")


def write_pdf(
    lines: list[str], out_path: str, title: str | None = None
) -> bytes:
    """Write `lines` (plus an optional emphasized title) as a multi-page
    PDF; returns the bytes as written."""
    styled: list[tuple[str, int, bool]] = []
    if title:
        styled.append((title, TITLE_SIZE, True))
        styled.append(("", BODY_SIZE, False))
    styled.extend((ln, BODY_SIZE, False) for ln in lines)

    usable = PAGE_H - 2 * MARGIN
    per_page = max(1, usable // LEADING - 1)
    pages = [styled[i : i + per_page] for i in range(0, len(styled), per_page)] or [[]]

    # object layout: 1 catalog, 2 pages-root, 3 F1, 4 F2,
    # then per page: page object + its content stream
    objs: list[bytes] = []
    n_pages = len(pages)
    page_ids = [5 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    for i, page_lines in enumerate(pages):
        content_id = page_ids[i] + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
                f"/Contents {content_id} 0 R >>"
            ).encode()
        )
        stream = _page_stream(page_lines)
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    data = bytes(buf)
    with open(out_path, "wb") as fh:
        fh.write(data)
    return data
