"""functions/punycode.py: RFC 3492 bootstring vs the stdlib codec, hosts,
hostile inputs."""

import codecs

import pytest

from pdf_extractor_ray.functions.punycode import (
    PunycodeError,
    idna_decode_host,
    punycode_decode,
    punycode_encode,
)

SAMPLES = [
    "münchen", "bücher", "παράδειγμα", "пример", "mañana", "例え",
    "עברית", "العربية", "pаypаl",  # Cyrillic а spoof
    "abc",  # all-basic
    "ü", "üa", "aü",
]


class TestRoundtrip:
    @pytest.mark.parametrize("s", SAMPLES)
    def test_matches_stdlib_and_roundtrips(self, s):
        enc = punycode_encode(s)
        assert enc == codecs.encode(s, "punycode").decode()
        assert punycode_decode(enc) == s

    def test_rfc_sample_mixed(self):
        # RFC 3492 §7.1 (L) "3年B組金八先生"
        s = "3年B組金八先生"
        enc = punycode_encode(s)
        assert punycode_decode(enc) == s
        assert enc == codecs.encode(s, "punycode").decode()


class TestHosts:
    def test_idna_decode_host(self):
        assert idna_decode_host("xn--mnchen-3ya.example.com") == "münchen.example.com"
        assert idna_decode_host("plain.example.com") == "plain.example.com"
        assert idna_decode_host("XN--MNCHEN-3YA.org") == "münchen.org"
        assert idna_decode_host("") == ""


class TestHostile:
    def test_bad_digit(self):
        with pytest.raises(PunycodeError):
            punycode_decode("abc-!!")

    def test_truncated(self):
        with pytest.raises(PunycodeError):
            punycode_decode("abc-zzzz" + "z" * 20)

    def test_non_ascii_basic(self):
        with pytest.raises(PunycodeError):
            punycode_decode("ü-abc")
