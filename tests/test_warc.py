"""WARC/1.0 codec + Dataset source/sink (sources/warc.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pdf_extractor_ray.sources.warc import (
    WarcError,
    build_record,
    parse_warc,
    read_warc,
    records_to_warc,
    warc_decode_batch,
    warc_encode_batch,
    write_warc,
)

URLS = [f"doc://{i:08d}" for i in range(5)]
TS = [1_767_225_600_000_000 + i * 1_000_000 for i in range(5)]
PAYLOADS = [b"<html>doc %d</html>" % i for i in range(5)]


def _pages_table(payloads=None):
    return pa.Table.from_arrays(
        [
            pa.array(URLS),
            pa.array(TS, pa.timestamp("us")),
            pa.array(payloads or PAYLOADS, pa.binary()),
        ],
        names=["url", "warc_ts", "html"],
    )


class TestRecordRoundtrip:
    @pytest.mark.parametrize("compress", [True, False])
    def test_roundtrip(self, compress):
        blob = records_to_warc(URLS, TS, PAYLOADS, compress=compress)
        recs = parse_warc(blob)
        assert [r["url"] for r in recs] == URLS
        assert [r["warc_ts"] for r in recs] == TS
        assert [r["payload"] for r in recs] == PAYLOADS
        assert all(r["digest_ok"] for r in recs)
        assert all(r["warc_type"] == "response" for r in recs)

    def test_binary_safe_payload(self):
        """Content-Length walk, never delimiter scanning: a payload that
        CONTAINS a fake record boundary + version line must survive."""
        evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n" + bytes(range(256))
        blob = records_to_warc(URLS[:1], TS[:1], [evil], compress=False)
        (rec,) = parse_warc(blob)
        assert rec["payload"] == evil

    def test_gzip_members_are_independent(self):
        """Common Crawl layout: each record its own gzip member."""
        blob = records_to_warc(URLS, TS, PAYLOADS, compress=True)
        # the blob truncated at the 2nd member magic is a valid 1-record WARC
        second_magic = blob.find(b"\x1f\x8b", 2)
        assert second_magic > 0
        recs = parse_warc(blob[:second_magic])
        assert len(recs) == 1 and recs[0]["url"] == URLS[0]

    def test_deterministic(self):
        a = records_to_warc(URLS, TS, PAYLOADS, compress=True)
        b = records_to_warc(URLS, TS, PAYLOADS, compress=True)
        assert a == b

    def test_truncated_gzip_raises(self):
        blob = records_to_warc(URLS, TS, PAYLOADS, compress=True)
        with pytest.raises(WarcError, match="truncated gzip"):
            parse_warc(blob[:-8])

    def test_truncated_body_raises(self):
        rec = build_record(URLS[0], TS[0], PAYLOADS[0])
        with pytest.raises(WarcError, match="truncated record body"):
            parse_warc(rec[: len(rec) - 10])

    def test_bad_version_raises(self):
        rec = build_record(URLS[0], TS[0], PAYLOADS[0])
        with pytest.raises(WarcError, match="bad version"):
            parse_warc(b"HTTP/1.1" + rec[8:])

    def test_digest_flag_detects_corruption(self):
        rec = bytearray(build_record(URLS[0], TS[0], b"AAAABBBB"))
        rec[rec.find(b"AAAABBBB")] = ord(b"Z")
        (parsed,) = parse_warc(bytes(rec))
        assert not parsed["digest_ok"]


class TestBatchCodec:
    def test_encode_decode_batch(self):
        blobs = warc_encode_batch(_pages_table(), records_per_blob=2)
        assert blobs.num_rows == 3
        out = warc_decode_batch(blobs)
        assert out["url"].to_pylist() == URLS
        assert out["warc_ts"].cast(pa.int64()).to_pylist() == TS
        assert out["html"].to_pylist() == PAYLOADS

    def test_mixed_compression(self):
        blobs = warc_encode_batch(_pages_table(), records_per_blob=2, compress="mixed")
        raw = blobs["warc"].to_pylist()
        assert raw[0][:2] == b"\x1f\x8b" and raw[1][:2] != b"\x1f\x8b"
        assert warc_decode_batch(blobs).num_rows == 5

    def test_digest_mismatch_raises_in_decode(self):
        rec = bytearray(build_record(URLS[0], TS[0], b"AAAABBBB"))
        rec[rec.find(b"AAAABBBB")] = ord(b"Z")
        tbl = pa.Table.from_arrays([pa.array([bytes(rec)], pa.binary())], names=["warc"])
        with pytest.raises(WarcError, match="digest mismatch"):
            warc_decode_batch(tbl)


class TestDatasetSinkSource:
    def test_write_read_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        ds = rd.from_arrow(_pages_table())
        paths = write_warc(ds, str(tmp_path / "warc"), records_per_blob=2)
        assert len(paths) == 3 and all(p.endswith(".warc.gz") for p in paths)
        back = read_warc(paths).to_pandas().sort_values("url").reset_index(drop=True)
        assert back["url"].tolist() == URLS
        assert [bytes(b) for b in back["html"]] == PAYLOADS

    def test_write_is_idempotent(self, ray_session, tmp_path):
        import ray.data as rd

        out = str(tmp_path / "warc")
        ds = rd.from_arrow(_pages_table())
        first = write_warc(ds, out, records_per_blob=2)
        second = write_warc(ds, out, records_per_blob=2)
        assert first == second  # content-addressed: re-run rewrites in place


class TestWetRecords:
    def test_conversion_roundtrip(self):
        blob = records_to_warc(
            URLS, TS, PAYLOADS, compress=True,
            record_type="conversion", content_type="text/plain",
        )
        recs = parse_warc(blob)
        assert all(r["warc_type"] == "conversion" for r in recs)
        assert [r["payload"] for r in recs] == PAYLOADS
        assert all(r["digest_ok"] for r in recs)

    def test_decode_type_filter(self):
        import pyarrow as _pa

        resp = records_to_warc(URLS[:1], TS[:1], PAYLOADS[:1], compress=False)
        conv = records_to_warc(
            URLS[1:2], TS[1:2], PAYLOADS[1:2], compress=False,
            record_type="conversion", content_type="text/plain",
        )
        tbl = _pa.Table.from_arrays(
            [_pa.array([resp + conv], _pa.binary())], names=["warc"]
        )
        only_conv = warc_decode_batch(tbl, types=("conversion",))
        assert only_conv["url"].to_pylist() == URLS[1:2]
        both = warc_decode_batch(tbl, types=("response", "conversion"))
        assert both.num_rows == 2

    def test_unknown_record_type_raises(self):
        import pytest as _pytest

        # "metadata" became the supported WAT layout in round 4d; a
        # genuinely unknown type still raises.
        with _pytest.raises(ValueError, match="unsupported record_type"):
            build_record("u", 0, b"x", record_type="request")


class TestWat:
    """WAT metadata records: JSON envelope roundtrip, digest check,
    mixed compression, binary-unsafe titles."""

    def test_roundtrip(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.sources.warc import (
            wat_decode_batch, wat_encode_batch,
        )

        tbl = pa.table(
            {
                "url": ["http://a/1", "http://b/2"],
                "warc_ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
                "html": [
                    b"<html><head><title>T &amp; A</title></head>"
                    b'<body><a href="x">1</a><a href="y">2</a></body></html>',
                    b"<html><body>no head</body></html>",
                ],
            }
        )
        blobs = wat_encode_batch(tbl, compress="mixed")
        out = wat_decode_batch(blobs).to_pylist()
        assert out[0]["title"] == "T & A" and out[0]["n_links"] == 2
        assert out[1]["title"] is None and out[1]["n_links"] == 0
        assert out[0]["url"] == "http://a/1"

    def test_digest_tamper_raises(self):
        import pytest

        from pdf_extractor_ray.sources.warc import (
            WarcError, wat_decode_batch, wat_encode_batch,
        )

        tbl = pa.table(
            {
                "url": ["http://a/1"],
                "warc_ts": pa.array([0], pa.timestamp("us")),
                "html": [b"<html><head><title>x</title></head></html>"],
            }
        )
        blob = bytearray(wat_encode_batch(tbl, compress=False)["warc"][0].as_py())
        i = bytes(blob).find(b'"Title":"x"')
        assert i > 0
        blob[i + 9] = ord("y")
        with pytest.raises(WarcError):
            wat_decode_batch(pa.table({"warc": [bytes(blob)]}))


class TestHttpStats:
    def test_status_and_mime_from_headers(self, ray_session):
        from pdf_extractor_ray.sources.warc import (
            http_stats_batch, records_to_warc,
        )

        blob = records_to_warc(
            ["u1", "u2", "u3"],
            [0, 1_000_000, 2_000_000],
            [b"a", b"b", b"c"],
            compress=False,
            statuses=[200, 404, 200],
            content_types=[
                "text/html; charset=utf-8", "text/plain", "text/html",
            ],
        )
        out = http_stats_batch(pa.table({"warc": [blob]})).to_pylist()
        got = {(r["http_status"], r["mime"]): r["cnt"] for r in out}
        assert got == {(200, "text/html"): 2, (404, "text/plain"): 1}


class TestHttpCodings:
    """Round 5: as-captured HTTP response codings (chunked framing,
    gzip/deflate content-encoding, gzip-then-chunked wire order)."""

    @pytest.mark.parametrize(
        "coding", ["identity", "chunked", "gzip", "deflate", "gzip+chunked"]
    )
    def test_roundtrip_and_digest(self, coding):
        from pdf_extractor_ray.sources.warc import (
            _gzip_member,
            build_record,
            parse_warc,
        )

        body = b"hello crawl body " * 40
        rec = build_record(
            "https://e.com/x", 1_700_000_000_000_000, body,
            http_coding=coding,
        )
        (r,) = parse_warc(_gzip_member(rec))
        assert r["payload"] == body
        assert r["http_coding"] == coding
        assert r["digest_ok"]  # digest covers the STORED (coded) bytes

    def test_chunked_malformed_raises(self):
        from pdf_extractor_ray.sources.warc import WarcError, _dechunk

        with pytest.raises(WarcError, match="size line"):
            _dechunk(b"zz\r\nabc")
        with pytest.raises(WarcError, match="truncated"):
            _dechunk(b"10\r\nshort\r\n0\r\n\r\n")

    def test_brotli_typed_unsupported(self):
        from pdf_extractor_ray.sources.warc import _CRLF, parse_warc

        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html" + _CRLF
            + b"Content-Encoding: br" + _CRLF + _CRLF
            + b"\x00fakebrotli"
        )
        rec = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Date: 2026-01-01T00:00:00Z" + _CRLF
            + b"WARC-Target-URI: https://e.com/b" + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
            + _CRLF + http + _CRLF + _CRLF
        )
        with pytest.raises(NotImplementedError, match="br"):
            parse_warc(rec)


class TestWarcSalvage:
    """Round 5: tolerant walk over corrupt archives — every intact
    member recovers; rotten members are skipped, never fatal."""

    def _members(self, n=8):
        from pdf_extractor_ray.sources.warc import _gzip_member, build_record

        recs = [
            build_record(f"doc://x/{j}", 1_700_000_000_000_000 + j,
                         b"payload body %d" % j)
            for j in range(n)
        ]
        return recs, [_gzip_member(r) for r in recs]

    def test_clean_blob_full_recovery(self):
        from pdf_extractor_ray.sources.warc import parse_warc_salvage

        _, m = self._members()
        assert len(parse_warc_salvage(b"".join(m))) == 8

    def test_bitflip_member_skipped(self):
        from pdf_extractor_ray.sources.warc import parse_warc_salvage

        _, m = self._members()
        bad = bytearray(m[3])
        bad[len(bad) // 2] ^= 0xFF
        got = parse_warc_salvage(b"".join(m[:3] + [bytes(bad)] + m[4:]))
        assert [r["url"][-1] for r in got] == ["0", "1", "2", "4", "5", "6", "7"]

    def test_truncated_tail_member(self):
        from pdf_extractor_ray.sources.warc import parse_warc_salvage

        _, m = self._members()
        got = parse_warc_salvage(b"".join(m[:7]) + m[7][: len(m[7]) // 2])
        assert len(got) == 7

    def test_bad_record_in_valid_member(self):
        from pdf_extractor_ray.sources.warc import (
            _gzip_member,
            parse_warc_salvage,
        )

        recs, m = self._members()
        m[0] = _gzip_member(recs[0].replace(b"WARC/1.0", b"WARC/9.9", 1))
        assert len(parse_warc_salvage(b"".join(m))) == 7

    def test_plain_stream_resync(self):
        from pdf_extractor_ray.sources.warc import parse_warc_salvage

        recs, _ = self._members(3)
        blob = recs[0] + b"garbage not a record\r\n\r\n" + recs[1] + recs[2]
        # plain stream: corrupt bytes between records resync on WARC/1.0
        got = parse_warc_salvage(blob)
        assert len(got) == 3

    def test_strict_parse_still_raises(self):
        from pdf_extractor_ray.sources.warc import WarcError, parse_warc

        _, m = self._members()
        bad = bytearray(m[3])
        bad[len(bad) // 2] ^= 0xFF
        with pytest.raises((WarcError, OSError, Exception)):
            parse_warc(b"".join(m[:3] + [bytes(bad)] + m[4:]))
