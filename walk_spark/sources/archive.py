"""Physical walk-archive formats (S4/S5): CBOR resource files + CDXJ index.

Reference layout (lib/resource_handler.go:58-106 CBORResourceFileWriter):

    <base>/meta/<base64(url)[:12]>/<base64(url)[12:]>   CBOR-encoded Meta()
    <base>/body/<hash[:2]>/<hash[2:]>                   CBOR byte string
    <base>/index.cdxj                                   SURT-sorted index

Meta() is the body-less resource struct (lib/resource.go:70-87), encoded
with canonical CBOR + RFC3339 timestamps (resource_handler.go:84-85
``CborHandle{TimeRFC3339: true, Canonical: true}``); map keys are the
struct's json tags with omitempty semantics (lib/resource.go:22-55). The
CDXJ line format is ``<surt> <RFC3339 ts> <type> <json>`` per the public
CDXJ spec used by datatogether/cdxj (resource_handler.go:160-175 record
fields: hash, size, url [+ redirectTo, redirectFrom, jobID]).

The container has no CBOR library, so a minimal RFC 8949 subset codec
(maps/arrays/text/bytes/ints/floats/null/bool/tag-0 time) is implemented
below from the public spec — canonical form: definite lengths, sorted map
keys.

Write path is distributed (``foreachPartition`` — each task writes its own
rows' files; on a cluster ``base`` is an object-store mount). The index is
rendered driver-side like the sitemap (one file by definition); at archive
scale the same lines write as a sorted partitioned text table instead.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
import os
import struct as _struct

from pyspark.sql import DataFrame, functions as F

from walk_spark.functions.urlnorm import surt

# ---------------------------------------------------------------------------
# minimal canonical CBOR (RFC 8949 subset)
# ---------------------------------------------------------------------------


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return bytes([(major << 5) | 25]) + arg.to_bytes(2, "big")
    if arg < 0x100000000:
        return bytes([(major << 5) | 26]) + arg.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + arg.to_bytes(8, "big")


def cbor_encode(obj) -> bytes:
    """Canonical CBOR: definite lengths, map keys sorted by encoded bytes
    (RFC 8949 §4.2.1), float64 for floats, tag 0 (RFC3339 text) for
    datetimes — matching ugorji's Canonical+TimeRFC3339 handle."""
    if obj is None:
        return b"\xf6"
    if obj is True:
        return b"\xf5"
    if obj is False:
        return b"\xf4"
    if isinstance(obj, int):
        return _head(0, obj) if obj >= 0 else _head(1, -1 - obj)
    if isinstance(obj, float):
        return b"\xfb" + _struct.pack(">d", obj)
    if isinstance(obj, bytes):
        return _head(2, len(obj)) + obj
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return _head(3, len(b)) + b
    if isinstance(obj, (list, tuple)):
        return _head(4, len(obj)) + b"".join(cbor_encode(x) for x in obj)
    if isinstance(obj, dict):
        items = sorted(
            (cbor_encode(k), cbor_encode(v)) for k, v in obj.items()
        )
        return _head(5, len(items)) + b"".join(k + v for k, v in items)
    if isinstance(obj, dt.datetime):
        return b"\xc0" + cbor_encode(obj.strftime("%Y-%m-%dT%H:%M:%SZ"))
    raise TypeError(f"cbor_encode: unsupported type {type(obj)}")


def _decode(b: bytes, i: int):
    ib = b[i]
    major, info = ib >> 5, ib & 0x1F
    i += 1
    if info < 24:
        arg = info
    elif info == 24:
        arg, i = b[i], i + 1
    elif info == 25:
        arg, i = int.from_bytes(b[i:i + 2], "big"), i + 2
    elif info == 26:
        arg, i = int.from_bytes(b[i:i + 4], "big"), i + 4
    elif info == 27:
        arg, i = int.from_bytes(b[i:i + 8], "big"), i + 8
    else:
        raise ValueError("indefinite lengths not in canonical subset")
    if major == 0:
        return arg, i
    if major == 1:
        return -1 - arg, i
    if major == 2:
        return b[i:i + arg], i + arg
    if major == 3:
        return b[i:i + arg].decode("utf-8"), i + arg
    if major == 4:
        out = []
        for _ in range(arg):
            v, i = _decode(b, i)
            out.append(v)
        return out, i
    if major == 5:
        m = {}
        for _ in range(arg):
            k, i = _decode(b, i)
            v, i = _decode(b, i)
            m[k] = v
        return m, i
    if major == 6:  # tag — only tag 0 (RFC3339 text) in the subset
        v, i = _decode(b, i)
        return v, i
    # major 7 simple/float
    if info == 22:
        return None, i
    if info == 21:
        return True, i
    if info == 20:
        return False, i
    if info == 27:
        return _struct.unpack(">d", b[i - 8:i])[0], i
    raise ValueError(f"cbor_decode: unsupported simple value {info}")


def cbor_decode(b: bytes):
    v, i = _decode(bytes(b), 0)
    if i != len(b):
        raise ValueError("trailing bytes after CBOR value")
    return v


# ---------------------------------------------------------------------------
# resource meta <-> CBOR maps
# ---------------------------------------------------------------------------

#: resources-table column -> Meta json tag (lib/resource.go:22-55 order)
_META_FIELDS = [
    ("job_id", "jobID"),
    ("url", "url"),
    ("warc_ts", "timestamp"),
    ("status", "status"),
    ("content_type", "contentType"),
    ("content_sniff", "contentSniff"),
    ("content_length", "contentLength"),
    ("title", "title"),
    ("headers", "headers"),
    ("hash", "hash"),
    ("links", "links"),
    ("redirect_to", "redirectTo"),
    ("error", "error"),
]


def resource_meta_dict(row: dict) -> dict:
    """Meta() map with omitempty semantics (empty string / 0 / empty list /
    NULL are skipped, like Go's json omitempty on lib/resource.go:70-87)."""
    out = {}
    for col, tag in _META_FIELDS:
        v = row.get(col)
        if isinstance(v, dt.datetime):
            v = v.strftime("%Y-%m-%dT%H:%M:%SZ")
        if v in (None, "", 0) or (isinstance(v, list) and not v):
            continue
        out[tag] = list(v) if isinstance(v, list) else v
    return out


def _meta_path(base: str, url: str) -> str:
    b64 = base64.standard_b64encode(url.encode("utf-8")).decode("ascii")
    return os.path.join(base, "meta", b64[:12], b64[12:])


def _body_path(base: str, h: str) -> str:
    return os.path.join(base, "body", h[:2], h[2:])


#: archives with more records than this auto-switch to the distributed
#: sorted-table index (write_cdxj_table) — the single-file render collects
#: a (surt, ts, record) projection to the driver, which is reference
#: parity at walk-sized archives but a scale-killer past it. The caller
#: can still force either path via ``index_partitions``.
AUTO_INDEX_THRESHOLD = 1_000_000


def write_cbor_archive(resources: DataFrame, base: str,
                       bodies: DataFrame | None = None,
                       index_partitions: int | None = None) -> None:
    """Write the content-addressed archive layout. ``resources`` is the
    meta projection (ok_resources()); ``bodies`` optionally maps
    (hash, body binary) — bodies are stored once per hash (content
    addressing dedups identical payloads for free).

    Each partition writes its own files (no driver materialization); the
    CDXJ index is finalized driver-side from the tiny (surt, ts, record)
    projection, sorted like cdxj.Writer.Close does."""
    os.makedirs(os.path.join(base, "meta"), exist_ok=True)
    os.makedirs(os.path.join(base, "body"), exist_ok=True)
    cols = resources.columns

    def _write_meta(rows):
        for r in rows:
            d = r.asDict()
            if not d.get("url"):
                continue  # resource_handler.go:110-113
            p = _meta_path(base, d["url"])
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(cbor_encode(resource_meta_dict(d)))

    resources.foreachPartition(_write_meta)
    if bodies is not None:
        def _write_body(rows):
            for r in rows:
                h = r["hash"]
                if not h or len(h) <= 2 or r["body"] is None:
                    continue  # resource_handler.go:137
                p = _body_path(base, h)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "wb") as f:
                    f.write(cbor_encode(bytes(r["body"])))
        bodies.select("hash", "body").foreachPartition(_write_body)

    # Index path selection: caller override (0 = force single-file,
    # >0 = force distributed with that many parts), else AUTOMATIC — big
    # archives engage the distributed sorted table without the caller
    # needing to know it exists (the count is one column-pruned job).
    if index_partitions is None:
        n = resources.count()
        index_partitions = 32 if n > AUTO_INDEX_THRESHOLD else 0
    if index_partitions > 0:
        write_cdxj_table(
            resources, os.path.join(base, "index.cdxj.d"), index_partitions
        )
        return
    # index.cdxj single-file render — reference parity (cdxj.Writer.Close
    # writes one sorted file; record fields per resource_handler.go:160-175).
    # Fine at walk-size archives; auto-switches above the threshold.
    proj = resources.select(
        "url", "warc_ts", "hash", "content_length",
        *(c for c in ("redirect_to", "redirect_from", "job_id")
          if c in cols),
    ).collect()
    lines = [_cdxj_line(r.asDict(), cols) for r in proj]
    with open(os.path.join(base, "index.cdxj"), "w") as f:
        f.write("\n".join(sorted(lines)) + ("\n" if lines else ""))


def _cdxj_line(d: dict, cols) -> str:
    """One CDXJ index line (resource_handler.go:160-175 field set). Shared
    by the driver render and the distributed table writer so both produce
    byte-identical lines."""
    rec = {"hash": d["hash"], "size": d["content_length"], "url": d["url"]}
    if "redirect_to" in cols and d.get("redirect_to"):
        rec["redirectTo"] = d["redirect_to"]
    if "redirect_from" in cols and d.get("redirect_from"):
        rec["redirectFrom"] = d["redirect_from"]
    if "job_id" in cols and d.get("job_id"):
        rec["jobID"] = d["job_id"]
    ts = d["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
    return (
        f"{surt(d['url'])} {ts} response "
        f"{json.dumps(rec, sort_keys=True, separators=(',', ':'))}"
    )


def write_cdxj_table(resources: DataFrame, path: str,
                     partitions: int = 32) -> None:
    """Distributed CDXJ finalize: the SURT-sorted index as a partitioned
    text table — repartitionByRange over the line key (lines start with
    "<surt> <ts>", so ranging on the line ranges on surt) +
    sortWithinPartitions, one text file per range. Ascending range ids map
    to ascending part file names, so concatenating parts in filename order
    reproduces the single-file index byte-for-byte (tested) — but no
    driver materialization and no single-node sort, which is what an
    archive-scale index needs."""
    import pandas as pd

    cols = resources.columns
    proj = resources.select(
        "url", "warc_ts", "hash", "content_length",
        *(c for c in ("redirect_to", "redirect_from", "job_id")
          if c in cols),
    )

    def _lines(it):
        for pdf in it:
            # Arrow gives numpy scalars / NaN — normalize to the same
            # Python types the driver render sees (json.dumps rejects
            # int64; NaN is truthy and would fake a redirect field)
            pdf = pdf.astype(object).where(pd.notnull(pdf), None)
            rows = pdf.to_dict("records")
            for row in rows:
                row["content_length"] = int(row["content_length"])
            yield pd.DataFrame(
                {"value": [_cdxj_line(row, cols) for row in rows]}
            )

    lines = proj.mapInPandas(_lines, schema="value string")
    (
        lines.repartitionByRange(partitions, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite").text(path)
    )


def read_cbor_meta(spark, base: str) -> DataFrame:
    """Distributed read of the meta files back into a DataFrame:
    binaryFile scan + an Arrow-batched CBOR decode."""
    import pandas as pd

    # recursiveFileLookup, not a fixed meta/*/* glob: _meta_path uses
    # standard base64 whose alphabet includes '/', so URLs with e.g. '?'
    # get a '/' inside b64[12:] and their meta files land one directory
    # deeper — a two-level glob would silently drop them on read-back.
    files = spark.read.format("binaryFile") \
        .option("recursiveFileLookup", "true") \
        .load(os.path.join(base, "meta")).select("content")

    schema = ("jobID string, url string, timestamp string, status int, "
              "contentType string, contentSniff string, contentLength long, "
              "title string, headers array<string>, hash string, "
              "links array<string>, redirectTo string, error string")
    keys = [t for _, t in _META_FIELDS]

    def _dec(it):
        for pdf in it:
            rows = [cbor_decode(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {k: [r.get(k) for r in rows] for k in keys}
            )

    return files.mapInPandas(_dec, schema=schema)


def read_cdxj(spark, path: str) -> DataFrame:
    """Parse an index.cdxj into (surt_url, warc_ts, record_type, record)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 4)
    return lines.select(
        parts.getItem(0).alias("surt_url"),
        F.to_timestamp(parts.getItem(1), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("warc_ts"),
        parts.getItem(2).alias("record_type"),
        parts.getItem(3).alias("record"),
    )
