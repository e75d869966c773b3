"""PII scrubbing and URL/domain analysis (functions/text.py) — corpus
cleaning parity-plus operators, cross-checked against DuckDB regexes
on the real documents table."""

import duckdb
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.text import (
    PII_PATTERNS, domain_stats, extract_urls, pii_counts, scrub_pii,
    url_domain,
)

SF = "/root/testdata/sf0.001"


def test_scrub_pii_replaces_each_kind(spark):
    df = spark.createDataFrame(
        [(1, "mail me at alice.smith+x@example.co.uk or call +1 (555) 123-4567"),
         (2, "server 192.168.10.1 charged card 4111 1111 1111 1111 today"),
         (3, "nothing sensitive here at all")],
        "doc_id int, text string")
    out = {r["doc_id"]: r["clean"] for r in
           df.select("doc_id", scrub_pii(F.col("text")).alias("clean")).collect()}
    assert "<EMAIL>" in out[1] and "alice" not in out[1]
    assert "<PHONE>" in out[1] and "4567" not in out[1]
    assert "<IP>" in out[2] and "192.168" not in out[2]
    assert "<CARD>" in out[2] and "4111" not in out[2]
    assert out[3] == "nothing sensitive here at all"


def test_pii_counts_struct(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com and c@d.org but only one ip 10.0.0.1")],
        "doc_id int, text string")
    r = df.select(pii_counts(F.col("text")).alias("p")).first()["p"]
    assert r["email"] == 2 and r["ip"] == 1 and r["card"] == 0


def test_url_extraction_and_domains(spark):
    df = spark.createDataFrame(
        [(1, 'see https://www.Example.com/path?q=1 and http://sub.other.org:8080/x '
             "plus (https://example.com/two) trailing"),
         (2, "no links")],
        "doc_id int, text string")
    urls = df.select("doc_id", F.explode(extract_urls(F.col("text"))).alias("u"))
    got = [r["u"] for r in urls.filter(F.col("doc_id") == 1).collect()]
    assert len(got) == 3
    doms = {r["d"] for r in urls.select(url_domain(F.col("u")).alias("d")).collect()}
    assert doms == {"example.com", "sub.other.org"}


def test_domain_stats_counts_docs_and_urls(spark):
    df = spark.createDataFrame(
        [(1, "x https://a.com/1 y https://a.com/2 z https://b.net/"),
         (2, "https://a.com/3"),
         (3, "plain text")],
        "doc_id int, text string")
    rows = {r["domain"]: (r["n_docs"], r["n_urls"])
            for r in domain_stats(df).collect()}
    assert rows == {"a.com": (2, 3), "b.net": (1, 1)}


def test_email_scrub_matches_duckdb_on_documents(spark):
    # cross-engine pin on real corpus text: the email regex (the only
    # PII kind whose pattern syntax is identical across engines) must
    # find the same per-doc match counts as DuckDB
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    got = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(PII_PATTERNS["email"]), F.lit(0))).alias("n"),
    ).collect()}
    con = duckdb.connect()
    exp = {r[0]: r[1] for r in con.execute(f"""
        SELECT doc_id, len(regexp_extract_all(text, '{PII_PATTERNS["email"]}'))
        FROM '{SF}/documents.parquet'
    """).fetchall()}
    assert got == exp


def test_strip_html(spark):
    from fsharp_dataframe_spark.functions.text import strip_html

    rows = [
        ("<html><head><style>p{color:red}</style></head>"
         "<body><p>Hello <b>world</b></p><!-- note --></body></html>",
         "Hello world"),
        ("<script>var x = '<p>';</script>before &amp; after&nbsp;end",
         "before & after end"),
        ("no markup at all", "no markup at all"),
        ("a &lt;tag&gt; literal &quot;q&quot; &#39;s&#39;",
         "a <tag> literal \"q\" 's'"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "t string")
    got = [r[0] for r in df.select(strip_html(F.col("t"))).collect()]
    assert got == [w for _, w in rows]


def test_collapse_whitespace(spark):
    from fsharp_dataframe_spark.functions.text import collapse_whitespace

    df = spark.createDataFrame([("  a\t b\n\nc  ",)], "t string")
    assert df.select(collapse_whitespace(F.col("t"))).first()[0] == "a b c"


def test_strip_html_nested_entities_single_unescape(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — one unescape pass must
    # yield the literal '&lt;', never fabricate '<' (amp replaced last)
    from fsharp_dataframe_spark.functions.text import strip_html

    df = spark.createDataFrame([("use &amp;lt;b&amp;gt; for bold",)],
                               "t string")
    assert df.select(strip_html(F.col("t"))).first()[0] == \
        "use &lt;b&gt; for bold"


def test_vocab_divergence_semantics(spark):
    """KL contributions: identical corpora diverge ~0; a planted
    drift token dominates the ranking; total is nonnegative (Gibbs,
    up to the millionth quantization)."""
    from pyspark.sql import functions as F

    from fsharp_dataframe_spark.functions.profile import vocab_divergence
    from fsharp_dataframe_spark.functions.util import release_cached

    base = [(i, "common words shared by both corpora") for i in range(20)]
    drift = [(100 + i, "common words shared plus driftword driftword")
             for i in range(20)]
    a = spark.createDataFrame(base + drift, "doc_id long, text string")
    b = spark.createDataFrame(base, "doc_id long, text string")

    same = vocab_divergence(b, b).agg(F.sum("kl_term")).first()[0]
    assert abs(same) < 1e-4

    div = vocab_divergence(a, b)
    total = div.agg(F.sum("kl_term")).first()[0]
    top = div.orderBy(F.col("kl_term").desc()).first()
    release_cached()
    assert total > 0
    assert top["token"] == "driftword" and top["c_b"] == 0
