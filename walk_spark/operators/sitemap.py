"""Sitemap sink + walk-archive read-path projections (SURVEY.md S6-S7, O1-O3).

The reference's SitemapGenerator (lib/sitemap.go) stores one Entry per
NORMALIZED url in badger (last write wins, sitemap.go:49-55) and finalizes
to a single JSON object-of-objects keyed by normalized url
(sitemap.go:84-116, golden format lib/sitemap_test.go:52-76).

DataFrame re-expression: groupBy(normalized url) argmax-by-arrival —
``max_by(entry, arrival_seq)`` — then a driver-side JSON render at write
time (the output is one small file by definition; everything before the
render is distributed).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from walk_spark.functions.urlnorm import normalize_url_series, surt_series

_norm_udf = F.pandas_udf(normalize_url_series, returnType=StringType())
_surt_udf = F.pandas_udf(surt_series, returnType=StringType())


def sitemap_entries(ok_resources: DataFrame) -> DataFrame:
    """One Entry per normalized url, last write (by superstep order) wins
    (D4). Input: CrawlResult.ok_resources()."""
    keyed = ok_resources.withColumn("_key", _norm_udf(F.col("url"))).filter(
        F.length("_key") > 0
    )
    arrival = F.struct(
        F.col("superstep"), F.col("warc_ts"), F.col("url")
    ).alias("_arrival")
    entry = F.struct(
        F.col("url"), F.col("title"), F.col("warc_ts").alias("timestamp"),
        F.col("status"), F.col("links"),
    )
    return (
        keyed.groupBy("_key")
        .agg(F.max_by(entry, arrival).alias("e"))
        .select(
            F.col("_key").alias("key"),
            F.col("e.url").alias("url"),
            F.col("e.title").alias("title"),
            F.col("e.timestamp").alias("timestamp"),
            F.col("e.status").alias("status"),
            F.col("e.links").alias("links"),
        )
    )


def _entry_obj(url, title, timestamp, status, links) -> dict:
    """One sitemap Entry dict — inner field order = the Go Entry struct
    order (lib/sitemap.go:119-130); redirects/resources null (unpopulated
    by the generator in the reference too — sitemap.go:132-142). Shared by
    the driver render and the distributed table writer so both produce
    byte-identical JSON."""
    if not isinstance(timestamp, str):  # round-tripped sitemaps carry RFC3339
        timestamp = timestamp.strftime("%Y-%m-%dT%H:%M:%SZ")
    # `links` may be a list (driver rows) or a numpy array (Arrow batches),
    # whose truth value is ambiguous — branch on None/len explicitly
    links = [str(x) for x in links] if links is not None else []
    return {
        "url": url,
        "title": title or "",
        "timestamp": timestamp,
        "status": int(status),
        "redirects": None,
        "resources": None,
        "links": links or None,
    }


def _entry_fragment(key: str, obj: dict) -> str:
    """The entry's exact byte slice of the full ``json.dumps(.., indent=2)``
    render: a one-entry dump minus its enclosing braces (entries sit at
    depth 1 either way, so indentation and escaping are identical)."""
    return json.dumps({key: obj}, indent=2)[2:-2]


def render_sitemap_json(entries: DataFrame) -> str:
    """Byte-format parity with the reference golden
    (lib/sitemap_test.go:52-76): JSON object keyed by normalized url, keys
    sorted (Go json.Marshal map ordering), 2-space indent, RFC3339 UTC
    timestamps. Driver-side render — reference parity (one small file by
    definition at walk-sized crawls); past AUTO_SITEMAP_THRESHOLD entries
    ``finalize_sitemap`` switches to the distributed ``write_sitemap_table``
    whose parts concatenate to these exact bytes."""
    rows = {r["key"]: r for r in entries.collect()}
    obj = {}
    for key in sorted(rows):  # Go json.Marshal sorts map keys
        r = rows[key]
        obj[key] = _entry_obj(r["url"], r["title"], r["timestamp"],
                              r["status"], r["links"])
    return json.dumps(obj, indent=2)


#: sitemaps with more entries than this auto-switch to the distributed
#: partitioned writer (finalize_sitemap) — the single-file render collects
#: every entry to the driver, which is reference parity at walk-sized
#: crawls but a driver bound at archive scale. Same pattern as the CDXJ
#: index's sources.archive.AUTO_INDEX_THRESHOLD.
AUTO_SITEMAP_THRESHOLD = 1_000_000


def write_sitemap_table(entries: DataFrame, path: str,
                        partitions: int = 32) -> None:
    """Distributed sitemap finalize: each entry rendered to its exact
    byte fragment of the single-file JSON (``_entry_fragment`` + a trailing
    comma), range-partitioned and sorted by key — ascending range ids map
    to ascending part file names, so ``concat_sitemap_table`` reproduces
    ``render_sitemap_json`` byte-for-byte (tested) with no driver
    materialization and no single-node sort."""
    import pandas as pd

    def _frags(it):
        for pdf in it:
            vals = []
            for r in pdf.to_dict("records"):
                obj = _entry_obj(r["url"], r["title"], r["timestamp"],
                                 r["status"], r["links"])
                vals.append(_entry_fragment(r["key"], obj) + ",")
            yield pd.DataFrame({"key": list(pdf["key"]), "value": vals})

    (
        entries.repartitionByRange(partitions, "key")
        .sortWithinPartitions("key")
        .mapInPandas(_frags, schema="key string, value string")
        .select("value")
        .write.mode("overwrite").text(path)
    )


def concat_sitemap_table(path: str) -> str:
    """Stream-concatenate a ``write_sitemap_table`` directory's parts (in
    filename order) back into the single-file JSON — a test/compat helper
    and the small-output escape hatch; at scale the part directory IS the
    artifact."""
    import os
    parts = sorted(
        f for f in os.listdir(path)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    chunks = []
    for p in parts:
        with open(os.path.join(path, p)) as f:
            chunks.append(f.read())
    joined = "".join(chunks)
    if not joined:
        return "{}"
    # rows are "<fragment>,\n"; the full render separates fragments with
    # ",\n" and wraps in braces — drop the final ",\n" and close the object
    return "{\n" + joined[:-2] + "\n}"


def finalize_sitemap(entries: DataFrame, out_path: str,
                     partitions: int | None = None) -> str:
    """Write the finalized sitemap, auto-switching on size (the CDXJ
    pattern, sources.archive.write_cbor_archive): ≤ threshold → one
    reference-parity JSON file at ``out_path``; above it → a partitioned
    fragment table at ``out_path + '.d'`` whose ordered concatenation is
    that same file. ``partitions``: 0 forces the single file, >0 forces
    the table. Returns the path written."""
    import os
    import shutil
    if partitions is None:
        n = entries.count()
        partitions = 32 if n > AUTO_SITEMAP_THRESHOLD else 0
    # whichever form is written, remove the sibling form first — a smaller
    # re-run after a large one (or vice versa) must not leave a stale
    # artifact for a consumer to silently read
    if partitions > 0:
        if os.path.isfile(out_path):
            os.remove(out_path)
        write_sitemap_table(entries, out_path + ".d", partitions)
        return out_path + ".d"
    if os.path.isdir(out_path + ".d"):
        shutil.rmtree(out_path + ".d")
    with open(out_path, "w") as f:
        f.write(render_sitemap_json(entries))
    return out_path


def read_sitemap_json(spark, path: str) -> DataFrame:
    """S13: load a finalized sitemap.json back as an entries DataFrame —
    the input format of the reference's offline commands
    (cmd/inbound_links.go:35-52, cmd/clean.go:24-31). The file is a single
    driver-rendered JSON object by construction (one object per walk), so a
    driver-side parse is the faithful equivalent of the reference's
    ioutil.ReadFile + json.Unmarshal; the returned DataFrame is distributed
    for everything downstream."""
    import os
    if not os.path.exists(path) and os.path.isdir(path + ".d"):
        # finalize_sitemap auto-switched to the distributed fragment table;
        # its ordered concatenation IS the single-file JSON
        obj = json.loads(concat_sitemap_table(path + ".d"))
    else:
        with open(path) as f:
            obj = json.load(f)
    rows = [
        (
            key,
            e.get("url"),
            e.get("title") or "",
            e.get("timestamp"),
            e.get("status"),
            list(e.get("links") or []),
        )
        for key, e in obj.items()
    ]
    return spark.createDataFrame(
        rows,
        "key string, url string, title string, timestamp string, "
        "status int, links array<string>",
    )


def cdxj_index(ok_resources: DataFrame) -> DataFrame:
    """The CDXJ archive index (S4/S5/O1): SURT-key-sorted
    (surt_url, warc_ts, hash, content_length, url) — reference
    lib/resource_handler.go:157-175. Returned sorted; writers partition by
    surt range at scale (write.sortBy on a bucketed table)."""
    return (
        ok_resources.select(
            _surt_udf(F.col("url")).alias("surt_url"),
            "warc_ts", "hash",
            F.col("content_length").alias("size"),
            "url",
        )
        .orderBy("surt_url", "warc_ts")
    )


def sorted_index_page(ok_resources: DataFrame, limit: int, offset: int) -> DataFrame:
    """SortedIndex(limit, offset) pagination (lib/walk.go:130-152)."""
    return cdxj_index(ok_resources).offset(offset).limit(limit)
