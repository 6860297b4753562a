"""Golden-value unit tests for urlnorm / fingerprint / partitioner.

Mirrors the reference's tests/test_fingerprint.py, test_partitioners.py,
test_canonicalsolver.py, test_url.py style (SURVEY.md §5): fixed inputs,
exact expected values.
"""

import hashlib
import struct
import zlib
from binascii import unhexlify

import numpy as np
import pyarrow as pa
import pytest

from frontera_ray.functions.urlnorm import (
    canonicalize,
    canonicalize_array,
    extract_host,
    extract_host_array,
    resolve_link,
    domain_info,
)
from frontera_ray.functions.fingerprint import (
    sha1_hex,
    fp64,
    signed_crc32,
    partition_for_host,
    fingerprint_partition,
    hostname_local_fingerprint,
    sha1_batch,
    crc32_batch,
    partitions_from_host_hash,
)


class TestCanonicalize:
    @pytest.mark.parametrize(
        "dirty,clean",
        [
            ("HTTP://Site0.TEST:80/p1#frag", "http://site0.test/p1"),
            ("http://site0.test:80/p2", "http://site0.test/p2"),
            ("https://a.test:443/x", "https://a.test/x"),
            ("https://a.test:8443/x", "https://a.test:8443/x"),
            ("http://user:pw@a.test/x", "http://a.test/x"),
            ("http://site0.test", "http://site0.test/"),
            ("http://site0.test/p2?b=2&a=1", "http://site0.test/p2?a=1&b=2"),
            ("http://site0.test/q?", "http://site0.test/q"),
            ("http://site0.test/p0#x", "http://site0.test/p0"),
            ("http://site0.test/p0", "http://site0.test/p0"),
        ],
    )
    def test_golden(self, dirty, clean):
        assert canonicalize(dirty) == clean

    def test_idempotent(self):
        urls = [
            "http://site0.test/p1",
            "HTTP://Site9.TEST:80/a/b?z=1&y=2#f",
            "https://x.test/",
        ]
        once = [canonicalize(u) for u in urls]
        assert [canonicalize(u) for u in once] == once

    def test_array_matches_scalar(self):
        urls = [
            "http://site0.test/p1",          # fast path
            "HTTP://Site0.TEST:80/p1#frag",  # slow path
            "http://site1.test/p2?b=2&a=1",
            None,
        ]
        out = canonicalize_array(pa.array(urls, pa.string())).to_pylist()
        assert out[0] == "http://site0.test/p1"
        assert out[1] == "http://site0.test/p1"
        assert out[2] == "http://site1.test/p2?a=1&b=2"
        assert out[3] is None


class TestHost:
    def test_extract(self):
        assert extract_host("http://site0.test/p1") == "site0.test"
        assert extract_host("https://a.b.test:8443/x?q=1") == "a.b.test"
        assert extract_host("http://user@h.test/x") == "h.test"

    def test_array(self):
        urls = pa.array(
            ["http://site0.test/p1", "https://A.B.test:443/x", "http://h.test"]
        )
        assert extract_host_array(urls).to_pylist() == [
            "site0.test",
            "a.b.test",
            "h.test",
        ]

    def test_resolve(self):
        assert resolve_link("http://s.test/p1", "/p3") == "http://s.test/p3"
        assert (
            resolve_link("http://s.test/p1", "http://o.test/p0") == "http://o.test/p0"
        )

    def test_domain_info(self):
        d = domain_info("www.a.example.com")
        assert d == {
            "name": "www.a.example.com",
            "sld": "example.com",
            "tld": "com",
            "subdomain": "www.a",
        }


class TestFingerprint:
    def test_sha1_golden(self):
        # independent recomputation
        u = "http://site0.test/p0"
        assert sha1_hex(u) == hashlib.sha1(u.encode()).hexdigest()
        assert fp64(u) == int(sha1_hex(u)[:16], 16)

    def test_signed_crc32(self):
        # value with high bit set must come out negative (reference's
        # signed-int semantics; SURVEY.md §2.8)
        found_neg = False
        for s in ("site0.test", "site1.test", "example.com", "a.test", "b.test"):
            v = signed_crc32(s)
            assert -(1 << 31) <= v < (1 << 31)
            raw = zlib.crc32(s.encode())
            assert v == struct.unpack(">i", struct.pack(">I", raw))[0]
            found_neg |= v < 0
        assert found_neg  # at least one of these hosts exercises the signed path

    def test_partition_range_and_parity(self):
        for s in ("site0.test", "example.com", "x.test"):
            p = partition_for_host(s, 4)
            assert 0 <= p < 4
            assert p == signed_crc32(s) % 4  # python modulo of signed value

    def test_hostname_local_fingerprint(self):
        fp = hostname_local_fingerprint("http://site0.test/p1?a=1")
        assert len(fp) == 40
        # first 4 bytes = signed crc32 of host
        host_cs = struct.unpack(">i", unhexlify(fp[:8]))[0]
        assert host_cs == signed_crc32("site0.test")
        # same host ⇒ same 8-char prefix (host locality in the key)
        fp2 = hostname_local_fingerprint("http://site0.test/other")
        assert fp2[:8] == fp[:8]
        # doc part = md5(path;query+fragment)
        doc = hashlib.md5(b"/p1;a=1").hexdigest()
        assert fp[8:] == doc

    def test_fingerprint_partition(self):
        h = sha1_hex("http://site0.test/p0")
        assert fingerprint_partition(h, 4) == int(h[:5], 16) % 4

    def test_batch_matches_scalar(self):
        urls = [f"http://site{s}.test/p{i}" for s in range(3) for i in range(4)]
        fps, hexes = sha1_batch(urls)
        for u, f, h in zip(urls, fps, hexes):
            assert h == sha1_hex(u)
            assert int(f) == fp64(u)
        hosts = [f"site{s}.test" for s in range(10)]
        cr = crc32_batch(hosts)
        assert [int(c) for c in cr] == [signed_crc32(h) for h in hosts]
        parts = partitions_from_host_hash(cr, 4)
        assert [int(p) for p in parts] == [partition_for_host(h, 4) for h in hosts]


def test_fast_resolve_matches_urljoin():
    """ExtractLinks' fast-path resolver must be byte-identical to stdlib
    urljoin (which the conformance oracle uses) on every href shape."""
    from urllib.parse import urljoin

    from frontera_ray.stages.extract import _BASE_RE, _fast_resolve

    bases = [
        "http://site0.test/p1", "http://h.test/", "https://h.test:8080/a/b",
        "http://h.test/a/b?q=1", "http://h.test",
    ]
    hrefs = [
        "/p2", "http://x.test/p0", "https://y.test/", "p3", "../up",
        "//cdn.test/x", "", "/", "/dead9", "?q=2", "./z",
    ]
    for b in bases:
        m = _BASE_RE.match(b)
        root = m.group(0) if m else None
        for h in hrefs:
            assert _fast_resolve(root, b, h) == urljoin(b, h), (b, h)
