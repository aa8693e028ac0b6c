"""WARC source/sink: framing, round-trip, determinism, schema."""
import glob
import os

from tosidewalk_spark.sources import synth, warc


def test_record_framing_is_length_prefixed():
    """A body containing the literal record marker must not break parsing
    — framing walks Content-Length, it does not delimiter-scan."""
    evil = b"<html>WARC/1.0\r\n\r\nWARC/1.0 fake header</html>"
    blob = (warc.warcinfo_bytes("t")
            + warc.record_bytes("http://a.example/x", "2026-01-01T00:00:00Z", evil)
            + warc.record_bytes("http://a.example/y", "2026-01-02T03:04:05Z", b"<p>ok</p>"))
    recs = list(warc.iter_records(blob))
    assert [h[b"warc-type"] for h, _ in recs] == [b"warcinfo", b"response", b"response"]
    bodies = {h[b"warc-target-uri"].decode(): warc._http_body(p)
              for h, p in recs if h[b"warc-type"] == b"response"}
    assert bodies["http://a.example/x"] == evil
    assert bodies["http://a.example/y"] == b"<p>ok</p>"


def test_warc_roundtrip_and_deterministic_shards(spark, tmp_path):
    pages = synth.pages(spark, 300)
    man = warc.write_warc(pages, str(tmp_path / "w1"), shards=4).collect()
    assert sum(r.n_records for r in man) == 300
    assert all(os.path.getsize(r.path) == r.n_bytes for r in man)

    got = warc.scan_warc(spark, str(tmp_path / "w1")).collect()
    want = {r.url: r for r in pages.collect()}
    assert len(got) == 300
    for r in got:
        assert bytes(r.html) == bytes(want[r.url].html)
        assert r.warc_ts == want[r.url].warc_ts

    # byte-identical shards at a different parallelism (sorted-by-url writer)
    warc.write_warc(pages.repartition(13), str(tmp_path / "w2"), shards=4).collect()
    for p1 in sorted(glob.glob(str(tmp_path / "w1" / "*.warc"))):
        p2 = str(tmp_path / "w2" / os.path.basename(p1))
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read(), p1


def test_pages_from_warc_matches_input_hint_schema(spark, tmp_path):
    pages = synth.pages(spark, 120)
    warc.write_warc(pages, str(tmp_path / "w"), shards=2).collect()
    out = warc.pages_from_warc(spark, str(tmp_path / "w"))
    assert [f.name for f in out.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    got = {r.url: r for r in out.collect()}
    for r in pages.collect():  # G2 byte-identity holds through the container
        assert got[r.url].text == r.text
    assert all(isinstance(r.lang, str) and r.lang for r in got.values())


def test_scan_tolerates_real_world_records(spark, tmp_path):
    """Fractional-second WARC-Date (WARC 1.1, common in real archives) and
    a URI-less response record must not kill the scan (review r3)."""
    rec_frac = warc.record_bytes("http://a.example/f", "2023-06-01T12:00:00.123Z",
                                 b"<p>frac</p>")
    bad = rec_frac.replace(b"WARC-Target-URI: http://a.example/f\r\n", b"", 1)
    blob = (warc.record_bytes("http://a.example/ok", "2026-01-01T00:00:00Z", b"<p>ok</p>")
            + rec_frac + bad)
    d = tmp_path / "w"
    d.mkdir()
    (d / "part-00000.warc").write_bytes(blob)
    rows = {r.url: r for r in warc.scan_warc(spark, str(d)).collect()}
    assert set(rows) == {"http://a.example/ok", "http://a.example/f"}
    assert rows["http://a.example/f"].warc_ts.microsecond == 123000


def test_iter_records_skips_malformed_content_length():
    """A non-numeric Content-Length must skip that record and resync, not
    raise and kill the whole file's batch (ADVICE.md r3)."""
    good1 = warc.record_bytes("http://a.example/1", "2026-01-01T00:00:00Z", b"<p>1</p>")
    bad = warc.record_bytes("http://a.example/bad", "2026-01-01T00:00:00Z", b"<p>x</p>")
    # corrupt the WARC-layer Content-Length (first occurrence in the record)
    import re
    bad = re.sub(rb"Content-Length: \d+", b"Content-Length: oops", bad, count=1)
    good2 = warc.record_bytes("http://a.example/2", "2026-01-02T00:00:00Z", b"<p>2</p>")
    recs = list(warc.iter_records(good1 + bad + good2))
    uris = [h.get(b"warc-target-uri") for h, _ in recs]
    assert uris == [b"http://a.example/1", b"http://a.example/2"]


def test_jsonl_roundtrip_deterministic_and_failfast(spark, tmp_path):
    from pyspark.sql import functions as F

    from tosidewalk_spark.sources import jsonl
    docs = spark.createDataFrame(
        [(1, "en", 'quote " and \\ slash\tand unicode é'),
         (2, None, ""), (3, "de", None)],
        "doc_id long, lang string, text string")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    jsonl.write_jsonl(docs, d1, shards=2)
    # identical content from a different input partitioning
    jsonl.write_jsonl(docs.repartition(7), d2, shards=2)

    import glob
    read_bytes = lambda d: b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(f"{d}/part-*")))
    assert read_bytes(d1) == read_bytes(d2)

    back = {r.doc_id: (r.lang, r.text)
            for r in jsonl.scan_jsonl(spark, d1).collect()}
    assert back == {1: ("en", 'quote " and \\ slash\tand unicode é'),
                    2: (None, ""), 3: ("de", None)}

    # FAILFAST: a corrupt line is a loud error, not a silent NULL row
    bad = str(tmp_path / "bad")
    import os
    os.makedirs(bad)
    with open(f"{bad}/part-00000.json", "w") as f:
        f.write('{"doc_id": 1, "lang": "en", "text": "ok"}\n{not json\n')
    import pytest as _pt
    with _pt.raises(Exception):
        jsonl.scan_jsonl(spark, bad).collect()


def test_write_warc_committed_through_hadoop_fs(spark, tmp_path):
    """VERDICT r4 #5: the cluster-correct sink — tasks write attempt-
    unique temp shards, the driver publishes each with an atomic rename
    through the JVM Hadoop FileSystem API.  Shard bytes must be
    IDENTICAL to the local-mode write_warc output (same partitioning +
    in-shard sort), the _temporary dir must be gone after commit, and
    scan_warc must round-trip the pages."""
    pages = synth.pages(spark, 200)
    d_plain, d_fs = str(tmp_path / "plain"), str(tmp_path / "hfs")
    warc.write_warc(pages, d_plain, shards=3).collect()
    committed = warc.write_warc_committed(pages, d_fs, shards=3)
    assert sum(c["n_records"] for c in committed) == 200
    assert not os.path.exists(os.path.join(d_fs, "_temporary"))
    for p1 in sorted(glob.glob(os.path.join(d_plain, "*.warc"))):
        p2 = os.path.join(d_fs, os.path.basename(p1))
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read(), p1
    got = warc.scan_warc(spark, d_fs).collect()
    want = {r.url: bytes(r.html) for r in pages.collect()}
    assert len(got) == 200
    assert all(bytes(r.html) == want[r.url] for r in got)
