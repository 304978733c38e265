"""WHATWG mime sniffing — behavioral port of the content sniff used by the
reference (``http.DetectContentType`` at lib/resource.go:102), which
implements https://mimesniff.spec.whatwg.org/ over the first 512 bytes.

Only ``ContentSniff`` values of ``text/html; charset=utf-8`` or
``text/plain; charset=utf-8`` gate HTML link/title extraction in the
reference (lib/resource.go:117-131); other signatures are carried through
as metadata. The algorithm is public spec; this is an independent
implementation of the subset walk exercises (html tags, xml, a handful of
binary magics, valid-text fallback).
"""

from __future__ import annotations

_HTML_TAGS = [
    b"<!DOCTYPE HTML", b"<HTML", b"<HEAD", b"<SCRIPT", b"<IFRAME",
    b"<H1", b"<DIV", b"<FONT", b"<TABLE", b"<A", b"<STYLE", b"<TITLE",
    b"<B", b"<BODY", b"<BR", b"<P", b"<!--",
]

_EXACT_MAGICS = [
    (b"%PDF-", "application/pdf"),
    (b"%!PS-Adobe-", "application/postscript"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"BM", "image/bmp"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b\x08", "application/x-gzip"),
    (b"Rar!\x1a\x07\x00", "application/x-rar-compressed"),
    (b"\x00\x01\x00\x00", "font/ttf"),
    (b"OTTO", "font/otf"),
    (b"wOFF", "font/woff"),
    (b"wOF2", "font/woff2"),
    (b"OggS\x00", "application/ogg"),
    (b"ID3", "audio/mpeg"),
    (b"FLV\x01", "video/x-flv"),
    (b"\x1aE\xdf\xa3", "video/webm"),
    (b".snd", "audio/basic"),
]

_WS = b"\t\n\x0c\r "
_BINARY_BYTES = frozenset(
    list(range(0x00, 0x09)) + [0x0b] + list(range(0x0e, 0x1a))
    + list(range(0x1c, 0x20))
)


def detect_content_type(body: bytes | None) -> str:
    """Sniff the mime type of ``body`` (first 512 bytes)."""
    if body is None:
        return "text/plain; charset=utf-8"
    data = bytes(body[:512])
    stripped = data.lstrip(_WS)

    for tag in _HTML_TAGS:
        n = len(tag)
        if len(stripped) >= n and stripped[:n].upper() == tag:
            # tag must be terminated by space or '>'
            if tag == b"<!--" or (
                len(stripped) > n and stripped[n:n + 1] in (b" ", b">")
            ):
                return "text/html; charset=utf-8"
    if stripped.startswith(b"<?xml"):
        return "text/xml; charset=utf-8"

    for magic, mime in _EXACT_MAGICS:
        if data.startswith(magic):
            return mime
    if len(data) >= 12 and data[:4] == b"RIFF":
        if data[8:12] == b"WAVE":
            return "audio/wave"
        if data[8:12] == b"AVI ":
            return "video/avi"
        if data[8:12] == b"WEBP":
            return "image/webp"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "video/mp4"

    # BOMs => utf-16 text
    if data.startswith(b"\xfe\xff") or data.startswith(b"\xff\xfe"):
        return "text/plain; charset=utf-16"
    if data.startswith(b"\xef\xbb\xbf"):
        return "text/plain; charset=utf-8"

    if any(b in _BINARY_BYTES for b in data):
        return "application/octet-stream"
    return "text/plain; charset=utf-8"


#: sniff values that gate link/title extraction (lib/resource.go:117-131)
HTML_PARSEABLE = frozenset(
    {"text/html; charset=utf-8", "text/plain; charset=utf-8"}
)
