"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl end-to-end on a pages corpus
synthesized deterministically from the sf0.001 documents table.
``queries()``/``oracle_sql()`` cover the SQL-expressible operators of
SURVEY.md §2 plus the training-data ops (dedup families, similarity search,
text analysis), each verified against DuckDB on the same parquet.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the SQL string (the driver's compare sorts columns by name
and value-hashes them).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from walk_spark.config import CrawlConfig
from walk_spark.functions import text as T
from walk_spark.operators import dedup_text as DT
from walk_spark.operators import similarity as SIM
from walk_spark.plans.crawl import crawl

SF001 = "/root/testdata/sf0.001"

# pinned stopword SQL literal (shared with walk_spark.functions.text)
_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in T.EN_STOPWORDS) + "]"
_TOKENS_SPARK = T.words  # split(lower(text),' ') minus empties
_TOKENS_SQL = (
    "list_filter(string_split(lower(text), ' '), x -> length(x) > 0)"
)

# deterministic ANN query vector: embedding of vec_id = 0 (computed lazily)
_QV_CACHE: dict[str, list[float]] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    if sf_dir not in _QV_CACHE:
        row = (
            _t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 0)
            .select("embedding")
            .first()
        )
        _QV_CACHE[sf_dir] = [float(x) for x in row["embedding"]]
    return _QV_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# flagship: the crawl itself
# ---------------------------------------------------------------------------

def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Common-Crawl-style pages table derived from the driver's
    documents table: url/host from doc_id arithmetic, link graph
    i -> (4i+j+1) mod n (spanning BFS expansion from doc 0), html assembled
    from the document text. No external data; same shape as
    BASELINE.json input_hint."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType,
    )
    from walk_spark.sources.pages import _page_html, _page_text  # noqa

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    K, H = 4, 16

    def _url(i: int) -> str:
        return f"http://host{i % H}.test/doc/{i}.html"

    gen_schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
        ]
    )

    def _gen(it):
        for pdf in it:
            urls, htmls, texts = [], [], []
            for i, doc_text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                hrefs = [(_url((K * i + j + 1) % n), f"out {j}") for j in range(K)]
                paras = [str(doc_text)]
                urls.append(_url(i))
                htmls.append(_page_html(f"doc {i}", hrefs, paras))
                texts.append(_page_text(hrefs, paras))
            yield pd.DataFrame({"url": urls, "html": htmls, "text": texts})

    gen = docs.mapInPandas(_gen, schema=gen_schema)
    return gen.select(
        "url",
        F.to_timestamp(F.lit("2000-01-01 00:00:00")).alias("warc_ts"),
        "html", "text",
        F.lit("en").alias("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BFS-crawl the sf0.001-derived corpus for 3 supersteps with
    per-host politeness budgets and return the OK resources."""
    pages = _pages_from_documents(spark, SF001)
    cfg = CrawlConfig(
        seeds=["http://host0.test/doc/0.html"],
        domains=[f"http://host{h}.test" for h in range(16)],
        host_budget_per_superstep=16,
        max_supersteps=3,
        record_redirects=False,
    )
    r = crawl(spark, pages, cfg)
    return r.ok_resources().select(
        "url", "status", "title", "hash", "depth", "superstep",
        F.size("links").alias("n_links"),
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q1_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _seen_anti_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    errs = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .select("user_id").distinct()
    )
    return clicks.join(errs, "user_id", "left_anti").orderBy("user_id")


def _inbound_links(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_TOKENS_SPARK(F.col("text"))).alias("tok")
    )
    return (
        toks.filter(F.col("tok") == "spark")
        .select("doc_id").distinct().orderBy("doc_id")
    )


def _argmax_latest(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    arrival = F.struct("ts", "event_id")
    return (
        ev.groupBy("user_id")
        .agg(F.max_by("event_type", arrival).alias("last_event_type"),
             F.max("ts").alias("last_ts"))
        .select("user_id", "last_event_type",
                F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("last_ts"))
        .orderBy("user_id")
    )


def _timespan(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("start_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("end_ts"),
        F.count("*").cast("long").alias("n"),
    )


def _sorted_index_page(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(50)
        .limit(100)
    )


def _candidate_filter(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(
            (F.col("source") == "src1")
            & F.col("text").contains("spark")
            & ~F.col("text").contains("slow")
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


def _last_write_wins(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    arrival = F.struct("o_orderdate", "o_orderkey")
    return (
        o.groupBy("o_custkey")
        .agg(F.max_by("o_orderstatus", arrival).alias("last_status"),
             F.max("o_orderkey").alias("max_orderkey"))
        .orderBy("o_custkey")
    )


def _collection_union(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("value") > 50)
    u = a.unionByName(b)
    return (
        u.groupBy("event_id")
        .agg(F.count("*").cast("long").alias("n_copies"))
        .groupBy("n_copies")
        .agg(F.count("*").cast("long").alias("n_events"))
        .orderBy("n_copies")
    )


def _link_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_TOKENS_SPARK(F.col("text"))).alias("tok"))
    return toks.agg(
        F.count("tok").cast("long").alias("n_links"),
        F.countDistinct("tok").cast("long").alias("n_unique"),
    )


def _retry_policy(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    status = (
        F.when((F.col("event_type") == "error") & (F.col("value") > 50), "failed")
        .when(F.col("event_type") == "error", "queued")
        .otherwise("done")
    )
    return (
        ev.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("status")
    )


def _dedup_exact(spark, sf_dir):
    # corpus has no natural exact dups: inject a shifted copy of every doc
    # (same injection in the SQL oracle) so the operator's grouping is
    # actually exercised — every group must come back with n_docs=2
    docs = _t(spark, sf_dir, "documents")
    # fingerprint each document ONCE, then explode the (id, id+1e6) pair —
    # the old per-copy unionByName re-scanned and re-hashed every text
    base = docs.select(
        "doc_id", T.fingerprint_md5(F.col("text")).alias("fp")
    )
    both = base.select(
        F.explode(
            F.array(F.col("doc_id"), F.col("doc_id") + 1_000_000)
        ).alias("doc_id"),
        "fp",
    )
    d = DT.exact_duplicates(both, fp_col="fp")
    return d.select(
        "fp", F.col("n_docs").cast("long").alias("n_docs"), "keep_id"
    ).orderBy("fp")


def _token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        T.token_count_bpe(F.col("text")).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("len_chars"),
    ).orderBy("doc_id")


def _lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.distinct_stopword_hits(F.col("text")).cast("long").alias("stop_hits"),
        T.lang_id(F.col("text")).alias("lang_pred"),
    ).orderBy("doc_id")


def _quality_score(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


def _fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.fingerprint_md5(F.col("text")).alias("fp")
    ).orderBy("doc_id")


def _jaccard_pairs(spark, sf_dir):
    # exact all-pairs jaccard is the small-scale oracle path (quadratic in
    # shared tokens); capped at 1000 docs — MinHash-LSH is the scale path
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return DT.jaccard_word_pairs(docs, threshold=0.8)


def _ngram_jaccard(spark, sf_dir):
    # order-sensitive 3-gram shingle jaccard — the web-dedup metric word-set
    # jaccard can't see; exact oracle path, capped like jaccard_pairs
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return DT.jaccard_shingle_pairs(docs, threshold=0.8, n=3)


def _minhash_lsh(spark, sf_dir):
    # MinHash-LSH as candidate generator + exact word-set-jaccard verify
    # (the production dedup pattern). Injected exact duplicates guarantee
    # hits; at j >= 0.9 the 32x4 banding misses with P < 1e-13, so the
    # output equals the exact all-pairs jaccard >= 0.9 — the DuckDB oracle.
    docs = _t(spark, sf_dir, "documents")
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    return DT.lsh_near_dup_verified(docs.unionByName(dup), threshold=0.9)


def _simhash(spark, sf_dir):
    # SimHash blocking (hamming 0 -> same value -> same band buckets) +
    # fingerprint verify: output is exactly the fingerprint-equality pair
    # set, SQL-verifiable. The hamming<=3 near-dup variant stays covered by
    # tests/test_dedup.py against the exact jaccard baseline.
    docs = _t(spark, sf_dir, "documents")
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    return DT.simhash_exact_dups(docs.unionByName(dup))


def _simhash_near(spark, sf_dir):
    # The hamming<=3 BANDED path with a PROVABLE ground truth (round-5):
    # doc i gets 24 synthetic tokens "w{i}x{k}"; its twin (id + 500000)
    # appends ONE searched token "q{i}z{k}" whose insertion flips 1-3
    # signature bits — the flip count is computed EXACTLY from the vote
    # vector at construction time (SimHash is a deterministic function of
    # the token bag), so hamming(doc, twin) <= 3 by construction. Distinct
    # docs use disjoint token sets; the verified minimum hamming between
    # any two non-twin signatures in this fixed construction is 16, so the
    # operator's expected output is exactly {(i, i+500000)} — plain SQL.
    # The documents table supplies the (stable) id range being paired.
    import hashlib

    import numpy as np

    ids = [int(r["doc_id"]) for r in
           _t(spark, sf_dir, "documents").select("doc_id")
           .orderBy("doc_id").limit(150).collect()]
    sh = np.arange(64, dtype=np.uint64)

    def tbits(w):
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        return ((np.uint64(h) >> sh) & np.uint64(1)).astype(np.int64)

    def sig(v):
        s = np.uint64(0)
        for j in np.nonzero(v > 0)[0]:
            s |= np.uint64(1) << np.uint64(j)
        return int(s)

    rows, sigs = [], []
    for i in ids:
        toks = [f"w{i}x{k}" for k in range(24)]
        v = np.zeros(64, dtype=np.int64)
        for w in toks:
            v += 2 * tbits(w) - 1
        s_a = sig(v)
        twin = None
        s_b = s_a
        for k in range(400):
            y = f"q{i}z{k}"
            s2 = sig(v + (2 * tbits(y) - 1))
            if 1 <= bin(s_a ^ s2).count("1") <= 3:
                twin, s_b = toks + [y], s2
                break
        if twin is None:  # infallible fallback: bag-identical, hamming 0
            twin = list(reversed(toks))
        rows.append((i, " ".join(toks)))
        rows.append((i + 500_000, " ".join(twin)))
        sigs.extend([s_a, s_b])
    # soundness guard: every non-twin signature pair must sit far above
    # the max_hamming=3 line, else the SQL pair list would be wrong —
    # raise loudly instead of letting the harness record a silent mismatch
    arr = np.array(sigs, dtype=np.uint64)
    x = arr[:, None] ^ arr[None, :]
    pc = sum(((x >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
             for j in range(64))
    n = len(arr)
    for a in range(n):
        for b in range(a + 1, n):
            if pc[a, b] <= 3 and not (b == a + 1 and a % 2 == 0):
                raise AssertionError(
                    f"undesigned near pair at rows {a},{b}: {pc[a, b]}")
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return (DT.simhash_pairs(corpus, max_hamming=3)
            .select("id_a", "id_b").orderBy("id_a", "id_b"))


def _cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return SIM.cosine_topk(emb, qv, k=10)


def _ann_lsh_topk(spark, sf_dir):
    # inject 9 exact copies of the query vector (vec 0): identical vectors
    # share the query's LSH bucket with probability 1, so the bucketed ANN's
    # top-10 equals the exact brute-force top-10 (ten cosine-1.0 rows, ties
    # broken by vec_id) — the DuckDB oracle.
    emb = _t(spark, sf_dir, "embeddings")
    # the 9 injected copies come from ONE scan of the vec-0 row via an
    # exploded id-offset array (the old per-copy unionByName re-scanned the
    # parquet 10 times); the row multiset is identical
    q = emb.filter(F.col("vec_id") == 0)
    copies = q.select(
        F.explode(F.array(*[
            (F.col("vec_id") + F.lit(k * 1_000_000)) for k in range(1, 10)
        ])).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    ).select(*emb.columns)
    u = emb.unionByName(copies)
    qv = _query_vec(spark, sf_dir)
    return SIM.ann_topk_lsh(u, qv, k=10, bits=8, n_probe_flips=4)


def _ann_ivf_topk(spark, sf_dir):
    # IVF coarse-quantizer ANN (operators.ivf — the learned-region prune
    # path next to RP-LSH): the 9 injected query copies assign to the
    # query's own argmax cluster with probability 1, and the query probes
    # that cluster first, so the IVF top-10 equals the exact brute-force
    # top-10 (ten cosine-1.0 rows, ties by vec_id) — the same DuckDB
    # oracle as ann_lsh_topk. Cluster SHAPES may vary with float summation
    # order; the result set provably does not.
    from walk_spark.operators import ivf as IVF
    emb = _t(spark, sf_dir, "embeddings")
    # single-scan injected copies, same shape as _ann_lsh_topk
    q = emb.filter(F.col("vec_id") == 0)
    copies = q.select(
        F.explode(F.array(*[
            (F.col("vec_id") + F.lit(k * 1_000_000)) for k in range(1, 10)
        ])).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    ).select(*emb.columns)
    u = emb.unionByName(copies)
    qv = _query_vec(spark, sf_dir)
    return IVF.ivf_topk(u, qv, k=10, n_clusters=8, nprobe=3, iters=2)


def _embedding_dups(spark, sf_dir):
    # inject exact-duplicate vectors (vec_id + 1e6): identical vectors
    # collide in every LSH band with probability 1, and the banded 4x8
    # tables miss a true cosine>=0.99 pair with P ~ 6e-7 — the output equals
    # the exact all-pairs cosine >= 0.99 set (cosine verified exactly inside
    # buckets), which the DuckDB oracle computes by brute force.
    emb = _t(spark, sf_dir, "embeddings")
    dup = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    return SIM.embedding_dup_pairs(
        emb.unionByName(dup), threshold=0.99, dim=64, bits=4, bands=8
    )


def _graph_edges(spark, sf_dir):
    # deterministic synthetic link graph from orders: customer -> order bucket
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("n"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), (F.col("o_orderkey") % 50).cast("string"))
        .alias("dst"),
    )


def _graph_degrees(spark, sf_dir):
    from walk_spark.operators.graph import degrees
    return degrees(_graph_edges(spark, sf_dir)).select(
        "url",
        F.col("out_degree").cast("long").alias("out_degree"),
        F.col("in_degree").cast("long").alias("in_degree"),
    ).orderBy("url")


def _graph_pagerank(spark, sf_dir):
    from walk_spark.operators.graph import top_pages
    return top_pages(_graph_edges(spark, sf_dir), k=10, iters=5)


def _crawl_bfs(spark, sf_dir):
    pages = _pages_from_documents(spark, sf_dir)
    cfg = CrawlConfig(
        seeds=["http://host0.test/doc/0.html"],
        domains=[f"http://host{h}.test" for h in range(16)],
        host_budget_per_superstep=16,
        max_supersteps=3,
        record_redirects=False,
    )
    r = crawl(spark, pages, cfg)
    return r.order.orderBy("superstep", "discovery_seq").select(
        "superstep", "discovery_seq", "url"
    )


#: robots fixture rules for the robots_gate oracle query — covers the RFC
#: 9309 §2.2.2 cases: Allow under Disallow:/ (h0), longer Disallow
#: re-blocking an Allow subtree (h0 '/src1/1'), plain Disallow (h1),
#: exact-length tie going to Allow (h2), no rules (h3) — plus the §2.2.3
#: wildcard cases: '$' end anchor with mid-pattern '*' (h1 '/*0$' blocks
#: paths ending in 0), a longer wildcard Allow overriding it (h1
#: '/src*40$'), and a trailing-'*' Disallow beating a length-1 tie (h2
#: '/src3*').
_ROBOTS_RULES = [
    ("h0.test", "/", False),
    ("h0.test", "/src1/", True),
    ("h0.test", "/src1/1", False),
    ("h1.test", "/src2", False),
    ("h1.test", "/*0$", False),
    ("h1.test", "/src*40$", True),
    ("h2.test", "/", True),
    ("h2.test", "/", False),
    ("h2.test", "/src3*", False),
]


def _robots_rule_rx(value: str) -> str | None:
    """DuckDB (RE2) regex for a wildcard robots rule, or None for plain
    prefixes — an INDEPENDENT translation of RFC 9309 §2.2.3 for the
    oracle side (fixture literals contain no regex metacharacters)."""
    if "*" not in value and not value.endswith("$"):
        return None
    anchored = value.endswith("$")
    core = value[:-1] if anchored else value
    return "^" + core.replace("*", ".*") + ("$" if anchored else "")


def _robots_gate(spark, sf_dir):
    """RFC 9309 longest-match robots gate (operators.politeness.
    apply_robots) over candidate urls derived from documents: longest
    matching prefix wins, ties go to Allow, unmatched urls pass."""
    from walk_spark.operators.politeness import apply_robots
    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string"),
                    F.lit(".test"))
    cands = d.select(
        F.concat(F.lit("http://"), host, F.lit("/"), F.col("source"),
                 F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        host.alias("host"),
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "host string, disallow_prefix string, allow boolean"
    )
    return apply_robots(cands, rules).select("url").orderBy("url")


def _cuckoo_seen_filter(spark, sf_dir):
    """URL-seen anti-join through the CUCKOO prefilter (operators.cuckoo —
    the north rule's second filter kind): candidates whose partition
    filter says "definitely new" skip the exact anti-join; "maybe seen"
    candidates are confirmed exactly, so the output equals the plain
    anti-join the oracle computes."""
    from walk_spark.operators import cuckoo as CK
    from walk_spark.operators import dedup as D
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".test/d/"), F.col("doc_id").cast("string")
                 ).alias("url"),
        (F.col("doc_id") % 8).cast("int").alias("part_id"),
        "doc_id",
    )
    seen = base.filter(F.col("doc_id") % 3 == 0).select("part_id", "url")
    cands = base.select("part_id", "url")
    filters = CK.build_cuckoo_partitions(seen, 0, 1 << 20)
    return (
        D.anti_join_seen(cands, seen, filters,
                         filters_bytes=8 * (1 << 20) // 8,
                         filter_kind="cuckoo")
        .select("url").orderBy("url")
    )


def _priority_pick(spark, sf_dir):
    """Priority-queue frontier pick (operators.politeness with a priority
    order — north rule "priority queue"): top-5 urls per host by a
    priority expression (desc), canonical FIFO order as tie-break."""
    from walk_spark.operators.frontier import ORDER_COLS
    from walk_spark.operators.politeness import pick_budget_window
    ev = _t(spark, sf_dir, "events")
    queued = ev.select(
        F.col("user_id").cast("string").alias("host"),
        F.col("event_id").cast("string").alias("url"),
        F.lit(0).alias("depth"),
        F.col("event_id").cast("long").alias("discovery_seq"),
        F.col("value").cast("double").alias("value"),
    )
    order = [F.col("value").desc()] + [F.col(c) for c in ORDER_COLS]
    return (
        pick_budget_window(queued, 5, order=order)
        .select("host", "url", F.round("value", 4).alias("value"))
        .orderBy("host", "url")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing,
        "robots_gate": _robots_gate,
        "seen_anti_join": _seen_anti_join,
        "cuckoo_seen_filter": _cuckoo_seen_filter,
        "priority_pick": _priority_pick,
        "inbound_links": _inbound_links,
        "argmax_latest": _argmax_latest,
        "timespan": _timespan,
        "sorted_index_page": _sorted_index_page,
        "candidate_filter": _candidate_filter,
        "last_write_wins": _last_write_wins,
        "collection_union": _collection_union,
        "link_count": _link_count,
        "retry_policy": _retry_policy,
        "dedup_exact": _dedup_exact,
        "token_stats": _token_stats,
        "lang_id": _lang_id,
        "quality_score": _quality_score,
        "fingerprint": _fingerprint,
        "jaccard_pairs": _jaccard_pairs,
        "ngram_jaccard_pairs": _ngram_jaccard,
        "minhash_lsh_dedup": _minhash_lsh,
        "simhash_dedup": _simhash,
        "simhash_near_pairs": _simhash_near,
        "embedding_cosine_topk": _cosine_topk,
        "ann_lsh_topk": _ann_lsh_topk,
        "ann_ivf_topk": _ann_ivf_topk,
        "embedding_dup_pairs": _embedding_dups,
        "graph_degrees": _graph_degrees,
        "graph_pagerank_topk": _graph_pagerank,
        "crawl_bfs_order": _crawl_bfs,
    }


def _pagerank_sql(iters: int = 5, alpha: float = 0.85, k: int = 10) -> str:
    """Unrolled power-iteration PageRank (walk_spark.operators.graph
    semantics: uniform init, dangling mass redistributed each iteration) —
    iterative but bounded, so plain chained CTEs express it exactly."""
    ctes = [
        """e AS (SELECT 'n' || CAST(o_custkey AS VARCHAR) AS src,
                        'n' || CAST(o_orderkey % 50 AS VARCHAR) AS dst
                 FROM orders)""",
        """nodes AS (SELECT DISTINCT url FROM (
              SELECT src AS url FROM e UNION ALL SELECT dst FROM e))""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT url, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""m{i} AS (
            SELECT n.url, CAST(coalesce(s.mass, 0) AS DOUBLE) AS in_mass
            FROM nodes n LEFT JOIN (
              SELECT e.dst AS url, sum(r.rank / d.deg) AS mass
              FROM e JOIN deg d ON e.src = d.src
                     JOIN r{i-1} r ON r.url = e.src
              GROUP BY e.dst) s ON n.url = s.url)""")
        ctes.append(f"""r{i} AS (
            SELECT url,
                   (1 - {alpha}) / (SELECT n FROM nn)
                   + {alpha} * (in_mass
                       + (1 - (SELECT sum(in_mass) FROM m{i}))
                         / (SELECT n FROM nn)) AS rank
            FROM m{i})""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT url, CAST(round(rank, 6) AS DOUBLE) AS rank FROM r{iters}
        ORDER BY rank DESC, url ASC LIMIT {k}"""
    )


def _bfs_order_sql(supersteps: int = 3, out_deg: int = 4, hosts: int = 16,
                   budget: int = 16) -> str:
    """Unrolled BFS crawl-order oracle over the synthetic pages graph
    derived from documents (url i -> (4i+j+1) mod n): per superstep — pick
    ≤ budget per host in canonical (depth, seq, url) order, expand links in
    (parent_seq, ordinal) order, dedup (D1 min-winner), anti-join the seen
    set (D2), assign dense discovery_seq continuing the high-water mark.
    Mirrors walk_spark.plans.crawl's loop exactly at this fixture shape."""
    url = ("'http://host' || CAST(id % {h} AS VARCHAR) || '.test/doc/' || "
           "CAST(id AS VARCHAR) || '.html'").format(h=hosts)
    ctes = [
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
        f"js AS (SELECT unnest(generate_series(0, {out_deg - 1})) AS j)",
        ("f1 AS (SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS seq, "
         "0 AS depth)"),
        # seen after superstep 1's enqueue = seeds
        "seen1 AS (SELECT id FROM f1)",
        # budget pick (canonical order: depth, seq, url)
        f"""b1 AS (SELECT * FROM (
             SELECT f.*, row_number() OVER (
               PARTITION BY id % {hosts} ORDER BY depth, seq, {url}) AS rh
             FROM f1 f) WHERE rh <= {budget})""",
    ]
    for s in range(1, supersteps):
        ctes.append(f"""cand{s} AS (
            SELECT CAST((CAST({out_deg} AS BIGINT) * b.id + j.j + 1)
                        % (SELECT n FROM nn) AS BIGINT) AS id,
                   b.depth AS pdepth, b.seq AS pseq, j.j AS ord
            FROM b{s} b, js j)""")
        ctes.append(f"""ded{s} AS (
            SELECT id, pdepth, pseq, ord FROM (
              SELECT c.*, row_number() OVER (
                PARTITION BY id ORDER BY pdepth, pseq, ord) AS rn
              FROM cand{s} c) WHERE rn = 1)""")
        # seq high-water mark: f{s}'s seqs are the largest assigned so far
        # (dense, monotone per superstep), so its max is the next base
        ctes.append(f"""f{s+1} AS (
            SELECT id, pdepth + 1 AS depth,
                   (SELECT coalesce(max(seq), 0) FROM f{s})
                   + CAST(row_number() OVER (
                       ORDER BY pdepth, pseq, ord, {url}) AS BIGINT) AS seq
            FROM ded{s} WHERE id NOT IN (SELECT id FROM seen{s}))""")
        ctes.append(
            f"seen{s+1} AS (SELECT id FROM seen{s} "
            f"UNION ALL SELECT id FROM f{s+1})"
        )
        ctes.append(f"""b{s+1} AS (SELECT * FROM (
             SELECT f.*, row_number() OVER (
               PARTITION BY id % {hosts} ORDER BY depth, seq, {url}) AS rh
             FROM f{s+1} f) WHERE rh <= {budget})""")
    batches = "\nUNION ALL\n".join(
        f"SELECT {s} AS superstep, seq AS discovery_seq, {url} AS url "
        f"FROM b{s}"
        for s in range(1, supersteps + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(superstep AS INTEGER) AS superstep, discovery_seq,"
          f" url FROM ({batches}) ORDER BY superstep, discovery_seq"
    )


def oracle_sql() -> dict[str, str]:
    stops = _STOPS_SQL
    toks = _TOKENS_SQL
    robots_rules = ", ".join(
        "('{}', '{}', {}, {})".format(
            h, p,
            "NULL" if _robots_rule_rx(p) is None
            else f"'{_robots_rule_rx(p)}'",
            str(a).upper(),
        )
        for h, p, a in _ROBOTS_RULES
    )
    return {
        "robots_gate": f"""
            WITH cand AS (
              SELECT 'h' || CAST(doc_id % 4 AS VARCHAR) || '.test' AS host,
                     'http://h' || CAST(doc_id % 4 AS VARCHAR) || '.test/'
                       || source || '/' || CAST(doc_id AS VARCHAR) AS url,
                     '/' || source || '/' || CAST(doc_id AS VARCHAR) AS path
              FROM documents),
            rules(host, prefix, rx, allow) AS (VALUES {robots_rules}),
            m AS (
              SELECT c.url, r.prefix, r.allow,
                     row_number() OVER (
                       PARTITION BY c.url
                       ORDER BY length(r.prefix) DESC, r.allow DESC
                     ) AS rn
              FROM cand c JOIN rules r
                ON c.host = r.host
               AND ((r.rx IS NULL
                     AND substr(c.path, 1, length(r.prefix)) = r.prefix)
                    OR (r.rx IS NOT NULL
                        AND regexp_matches(c.path, r.rx))))
            SELECT url FROM cand
            WHERE url NOT IN (SELECT url FROM m)
            UNION ALL
            SELECT url FROM m WHERE rn = 1 AND allow
            ORDER BY url
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "cuckoo_seen_filter": """
            WITH u AS (
              SELECT 'http://h' || CAST(doc_id % 5 AS VARCHAR)
                     || '.test/d/' || CAST(doc_id AS VARCHAR) AS url,
                     doc_id
              FROM documents)
            SELECT url FROM u c
            WHERE NOT EXISTS (
              SELECT 1 FROM u s
              WHERE s.doc_id % 3 = 0 AND s.url = c.url)
            ORDER BY url
        """,
        "priority_pick": """
            SELECT host, url, value FROM (
              SELECT CAST(user_id AS VARCHAR) AS host,
                     CAST(event_id AS VARCHAR) AS url,
                     round(CAST(value AS DOUBLE), 4) AS value,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(value AS DOUBLE) DESC,
                                event_id ASC,
                                CAST(event_id AS VARCHAR) ASC
                     ) AS rn
              FROM events)
            WHERE rn <= 5
            ORDER BY host, url
        """,
        "seen_anti_join": """
            SELECT DISTINCT user_id FROM events e1
            WHERE event_type = 'click'
              AND NOT EXISTS (
                SELECT 1 FROM events e2
                WHERE e2.event_type = 'error' AND e2.value > 90
                  AND e2.user_id = e1.user_id)
            ORDER BY user_id
        """,
        "inbound_links": f"""
            SELECT DISTINCT doc_id
            FROM (SELECT doc_id, unnest({toks}) AS tok FROM documents)
            WHERE tok = 'spark'
            ORDER BY doc_id
        """,
        "argmax_latest": """
            SELECT user_id, last_event_type,
                   strftime(last_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
            FROM (
              SELECT user_id, event_type AS last_event_type, ts AS last_ts,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
            WHERE rn = 1
            ORDER BY user_id
        """,
        "timespan": """
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
                   count(*) AS n
            FROM events
        """,
        "sorted_index_page": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_orderdate DESC, o_orderkey ASC
            LIMIT 100 OFFSET 50
        """,
        "candidate_filter": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE source = 'src1'
              AND text LIKE '%spark%' AND text NOT LIKE '%slow%'
            ORDER BY doc_id
        """,
        "last_write_wins": """
            SELECT o_custkey, last_status, max_orderkey FROM (
              SELECT o_custkey, o_orderstatus AS last_status,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC,
                                                 o_orderkey DESC) AS rn,
                     max(o_orderkey) OVER (PARTITION BY o_custkey) AS max_orderkey
              FROM orders)
            WHERE rn = 1 ORDER BY o_custkey
        """,
        "collection_union": """
            SELECT n_copies, count(*) AS n_events FROM (
              SELECT event_id, count(*) AS n_copies FROM (
                SELECT * FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT * FROM events WHERE value > 50)
              GROUP BY event_id)
            GROUP BY n_copies ORDER BY n_copies
        """,
        "link_count": f"""
            SELECT count(tok) AS n_links, count(DISTINCT tok) AS n_unique
            FROM (SELECT unnest({toks}) AS tok FROM documents)
        """,
        "retry_policy": """
            SELECT status, count(*) AS n FROM (
              SELECT CASE
                WHEN event_type = 'error' AND value > 50 THEN 'failed'
                WHEN event_type = 'error' THEN 'queued'
                ELSE 'done' END AS status
              FROM events)
            GROUP BY status ORDER BY status
        """,
        "dedup_exact": f"""
            SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id FROM (
              SELECT doc_id,
                     md5(array_to_string({toks}, ' ')) AS fp
              FROM (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 1000000 AS doc_id, text FROM documents))
            GROUP BY fp HAVING count(*) > 1 ORDER BY fp
        """,
        "token_stats": f"""
            SELECT doc_id,
                   len({toks}) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
                   length(text) AS len_chars
            FROM documents ORDER BY doc_id
        """,
        "lang_id": f"""
            SELECT doc_id,
                   len(list_intersect(list_distinct({toks}), {stops})) AS stop_hits,
                   CASE WHEN len(list_intersect(list_distinct({toks}), {stops})) >= 3
                        THEN 'en' ELSE 'unknown' END AS lang_pred
            FROM documents ORDER BY doc_id
        """,
        "quality_score": f"""
            SELECT doc_id,
              CAST(round(
                    0.3 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                  + 0.2 * (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
                  + 0.3 * (CASE WHEN stop_hits >= 2 THEN 1.0 ELSE 0.0 END)
                  + 0.2 * (CASE WHEN digit_ratio <= 0.3 THEN 1.0 ELSE 0.0 END), 4)
                   AS DOUBLE) AS quality
            FROM (
              SELECT doc_id,
                     len({toks}) AS n_tokens,
                     round((length(text) - len({toks}) + 1)
                           / greatest(len({toks}), 1), 4) AS mean_word_len,
                     len(list_intersect(list_distinct({toks}), {stops})) AS stop_hits,
                     round(len(regexp_extract_all(text, '[0-9]'))
                           / greatest(length(text), 1), 4) AS digit_ratio
              FROM documents)
            ORDER BY doc_id
        """,
        "fingerprint": f"""
            SELECT doc_id, md5(array_to_string({toks}, ' ')) AS fp
            FROM documents ORDER BY doc_id
        """,
        "jaccard_pairs": f"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct({toks})) AS tok
              FROM documents WHERE doc_id < 1000),
            sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   round(i / (sa.sz + sb.sz - i), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.8
            ORDER BY id_a, id_b
        """,
        "embedding_cosine_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cosine
            FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            ORDER BY cosine DESC, e.vec_id ASC
            LIMIT 10
        """,
        "graph_degrees": """
            WITH e AS (
              SELECT 'n' || CAST(o_custkey AS VARCHAR) AS src,
                     'n' || CAST(o_orderkey % 50 AS VARCHAR) AS dst
              FROM orders),
            o AS (SELECT src AS url, count(*) AS out_degree FROM e GROUP BY src),
            i AS (SELECT dst AS url, count(*) AS in_degree FROM e GROUP BY dst)
            SELECT coalesce(o.url, i.url) AS url,
                   coalesce(out_degree, 0) AS out_degree,
                   coalesce(in_degree, 0) AS in_degree
            FROM o FULL OUTER JOIN i ON o.url = i.url
            ORDER BY url
        """,
        "ngram_jaccard_pairs": f"""
            WITH toksrc AS (
              SELECT doc_id, {toks} AS w FROM documents WHERE doc_id < 1000),
            sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       generate_series(0, greatest(len(w) - 3, 0)),
                       i -> array_to_string(list_slice(w, i + 1, i + 3), ' ')
                     ))) AS tok
              FROM toksrc),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   CAST(round(i / (sa.sz + sb.sz - i), 4) AS DOUBLE) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.8
            ORDER BY id_a, id_b
        """,
        # The sketch ops are posed as sketch-prune + exact-verify (the
        # production pattern), whose outputs equal exact SQL-computable sets
        # (miss probabilities < 1e-6, zero on the injected duplicates);
        # pagerank/BFS are bounded-iteration, unrolled into chained CTEs.
        "minhash_lsh_dedup": f"""
            WITH u AS (SELECT doc_id, text FROM documents
                       UNION ALL
                       SELECT doc_id + 1000000 AS doc_id, text FROM documents),
            toksd AS (
              SELECT doc_id, unnest(list_distinct({toks})) AS tok FROM u),
            sizes AS (SELECT doc_id, count(*) AS sz FROM toksd GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM toksd a JOIN toksd b
                ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   CAST(round(i / (sa.sz + sb.sz - i), 4) AS DOUBLE) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.9
            ORDER BY id_a, id_b
        """,
        "simhash_dedup": f"""
            WITH u AS (SELECT doc_id, text FROM documents
                       UNION ALL
                       SELECT doc_id + 1000000 AS doc_id, text FROM documents),
            fp AS (SELECT doc_id,
                          md5(array_to_string({toks}, ' ')) AS f
                   FROM u)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
            ORDER BY id_a, id_b
        """,
        # the hamming<=3 banded path: the Spark query constructs twins with
        # a provable 1-3-bit signature distance and >=16 bits between any
        # non-twin pair (asserted at run time), so the expected pair set is
        # exactly the designed (i, i+500000) list over the stable id range
        "simhash_near_pairs": """
            SELECT CAST(doc_id AS BIGINT) AS id_a,
                   CAST(doc_id + 500000 AS BIGINT) AS id_b
            FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150)
            ORDER BY id_a, id_b
        """,
        "ann_lsh_topk": """
            WITH u AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT e.vec_id + 1000000 * g.k AS vec_id, e.embedding
              FROM embeddings e,
                   (SELECT unnest(generate_series(1, 9)) AS k) g
              WHERE e.vec_id = 0),
            q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
            SELECT u.vec_id,
                   CAST(round(list_cosine_similarity(u.embedding, q.embedding),
                              4) AS DOUBLE) AS cosine
            FROM u, q
            ORDER BY cosine DESC, u.vec_id ASC
            LIMIT 10
        """,
        # the IVF query's contract mirrors ann_lsh_topk's: injected
        # identical copies make the approximate top-10 provably equal the
        # exact top-10, so the oracle is the same brute-force SQL
        "ann_ivf_topk": """
            WITH u AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT e.vec_id + 1000000 * g.k AS vec_id, e.embedding
              FROM embeddings e,
                   (SELECT unnest(generate_series(1, 9)) AS k) g
              WHERE e.vec_id = 0),
            q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
            SELECT u.vec_id,
                   CAST(round(list_cosine_similarity(u.embedding, q.embedding),
                              4) AS DOUBLE) AS cosine
            FROM u, q
            ORDER BY cosine DESC, u.vec_id ASC
            LIMIT 10
        """,
        "embedding_dup_pairs": """
            WITH u AS (SELECT vec_id, embedding FROM embeddings
                       UNION ALL
                       SELECT vec_id + 1000000 AS vec_id, embedding
                       FROM embeddings),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(round(list_cosine_similarity(a.embedding,
                                                       b.embedding), 4)
                          AS DOUBLE) AS cosine
              FROM u a JOIN u b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, cosine FROM p
            WHERE cosine >= 0.99
            ORDER BY id_a, id_b
        """,
        "graph_pagerank_topk": _pagerank_sql(iters=5, alpha=0.85, k=10),
        "crawl_bfs_order": _bfs_order_sql(supersteps=3, out_deg=4,
                                          hosts=16, budget=16),
    }
