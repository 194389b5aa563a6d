"""WHATWG-subset charset sniffing/decoding (functions/charset.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.charset import (
    decode_html_bytes,
    decode_pages_batch,
    encode_html,
    normalize_label,
    sniff_charset,
)


class TestSniff:
    def test_bom_utf8(self):
        assert sniff_charset(b"\xef\xbb\xbfhello") == ("utf-8", 3)

    def test_bom_utf16le(self):
        assert sniff_charset(b"\xff\xfeh\x00") == ("utf-16-le", 2)

    def test_bom_utf16be(self):
        assert sniff_charset(b"\xfe\xff\x00h") == ("utf-16-be", 2)

    def test_bom_wins_over_meta(self):
        raw = b"\xef\xbb\xbf<meta charset='ISO-8859-1'>"
        assert sniff_charset(raw) == ("utf-8", 3)

    def test_meta_charset(self):
        assert sniff_charset(b"<html><meta charset=windows-1252>") == (
            "windows-1252", 0,
        )

    def test_meta_http_equiv(self):
        raw = b'<meta http-equiv="Content-Type" content="text/html; charset=latin-1">'
        assert sniff_charset(raw) == ("windows-1252", 0)

    def test_meta_beyond_1024_ignored(self):
        raw = b"<html>" + b" " * 1024 + b"<meta charset='ISO-8859-1'>"
        assert sniff_charset(raw) == ("utf-8", 0)

    def test_unknown_label_falls_back(self):
        assert sniff_charset(b"<meta charset='klingon-9'>") == ("utf-8", 0)

    def test_default_utf8(self):
        assert sniff_charset(b"plain ascii") == ("utf-8", 0)


class TestLabels:
    @pytest.mark.parametrize(
        "label", ["latin1", "LATIN-1", "ISO-8859-1", "ascii", "cp1252"]
    )
    def test_latin_aliases_are_cp1252(self, label):
        assert normalize_label(label) == "windows-1252"

    def test_utf16_bare_label_is_le(self):
        assert normalize_label("UTF-16") == "utf-16-le"


class TestDecode:
    def test_cp1252_probe_bytes(self):
        # 0x80 0x97 0xE9 are € — é in cp1252, NOT latin-1 control chars
        raw = b"<meta charset=latin1>\x80 \x97 \xe9"
        text, enc = decode_html_bytes(raw)
        assert enc == "windows-1252"
        assert text.endswith("€ — é")

    @pytest.mark.parametrize("enc", ["utf-16-le", "utf-16-be"])
    def test_utf16_roundtrip(self, enc):
        body = "<html>héllo — €</html>"
        text, used = decode_html_bytes(encode_html(body, enc, with_bom=True))
        assert (text, used) == (body, enc)

    def test_mojibake_replaced_never_raises(self):
        text, enc = decode_html_bytes(b"ok \xff\xfe\xfd end")  # invalid utf-8
        assert "�" in text and enc == "utf-8"


class TestBatchStage:
    def test_pdf_passthrough_and_charset_column(self):
        batch = pa.Table.from_arrays(
            [
                pa.array(["a", "b", "c"], pa.string()),
                pa.array(
                    [
                        b"%PDF-1.4 binary",
                        encode_html("<p>café</p>", "utf-16-le", with_bom=True),
                        None,
                    ],
                    pa.binary(),
                ),
            ],
            names=["url", "html"],
        )
        out = decode_pages_batch(batch)
        assert out["charset"].to_pylist() == ["binary", "utf-16-le", "empty"]
        assert out["html"][0].as_py() == b"%PDF-1.4 binary"
        assert out["html"][1].as_py() == "<p>café</p>".encode()
        assert out["html"][2].as_py() is None


class TestWorldCharsets:
    """Round 5: crawl-significant WHATWG label rows beyond utf/cp1252,
    decoded by the stdlib codecs they map to."""

    @pytest.mark.parametrize(
        "label,enc,probe",
        [
            ("shift_jis", "shift_jis", "日本語"),
            ("EUC-JP", "euc_jp", "日本語"),
            ("gb2312", "gbk", "中文网页"),  # alias trap: decodes as GBK
            ("Big5", "big5", "中文字"),
            ("euc-kr", "euc_kr", "한국어"),
            ("windows-1251", "windows-1251", "Русский"),
            ("KOI8-R", "koi8-r", "Русский"),
            ("iso-8859-7", "iso-8859-7", "Ελληνικά"),
            ("ISO-8859-9", "windows-1254", "ğış"),  # WHATWG remap
            ("windows-1256", "windows-1256", "نص عربي"),
        ],
    )
    def test_label_roundtrip(self, label, enc, probe):
        from pdf_extractor_ray.functions.charset import (
            decode_html_bytes,
            encode_html,
        )

        body = f'<html><head><meta charset="{label}"></head><body><p>hi {probe}</p></body></html>'
        raw = encode_html(body, enc)
        text, used = decode_html_bytes(raw)
        assert used == enc
        assert probe in text and text == body

    def test_unknown_label_defaults_utf8(self):
        from pdf_extractor_ray.functions.charset import decode_html_bytes

        raw = b'<html><head><meta charset="x-no-such-charset"></head><body>ok</body></html>'
        _, used = decode_html_bytes(raw)
        assert used == "utf-8"


class TestPdfPassthrough:
    def test_leading_junk_pdf_not_reencoded(self):
        import pyarrow as pa

        from pdf_extractor_ray.functions.charset import decode_pages_batch
        from pdf_extractor_ray.functions.pdf_codec import build_pdf

        pdf = build_pdf("hello world from a pdf")
        junked = b"HTTP/1.1 200 OK\r\n\r\n" + pdf
        t = pa.Table.from_arrays(
            [
                pa.array(["u1", "u2"], pa.string()),
                pa.array([pdf, junked], pa.binary()),
            ],
            names=["url", "html"],
        )
        out = decode_pages_batch(t)
        assert out["charset"].to_pylist() == ["binary", "binary"]
        assert out["html"].to_pylist()[1] == junked  # byte-untouched
