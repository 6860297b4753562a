"""URL fingerprints and partition hashes.

Reference semantics (approximate cites, SURVEY.md §0):
  * sha1 fingerprint of the canonical URL — frontera/utils/fingerprint.py:~10-30
    (the 40-char hex in meta[b'fingerprint'])
  * hostname_local_fingerprint — frontera/utils/fingerprint.py:~30-55:
    4 bytes signed crc32(host) + 16 bytes md5(path+';'+params+query+fragment),
    hex-encoded → same-host URLs are byte-adjacent
  * signed crc32 host hash used by Crc32NamePartitioner —
    frontera/contrib/backends/partitioners.py:~1-60. The reference computes
    crc32 with *signed 32-bit* semantics and relies on Python's modulo to
    land in [0, n); we reproduce that exactly (partition parity).

Ours adds ``fp64`` (first 8 bytes of the sha1, as uint64) for the hot
membership/partition path — full hex strings only cross the parity boundary.

Scale note: hashlib over a Python loop runs ~1M urls/s/core; the stage is
embarrassingly parallel under map_batches so it never bottlenecks the
pipeline (the fetch-sim join and the seen shuffle dominate).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from binascii import hexlify, unhexlify
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa


def sha1_hex(url: str) -> str:
    return hashlib.sha1(url.encode("utf8", "ignore")).hexdigest()


def fp64(url: str) -> int:
    """First 8 bytes of sha1(url) as uint64."""
    return int.from_bytes(hashlib.sha1(url.encode("utf8", "ignore")).digest()[:8], "big")


def signed_crc32(s: str | bytes) -> int:
    """crc32 with signed-32-bit semantics (partition parity with the
    reference's Crc32NamePartitioner; see module docstring)."""
    if isinstance(s, str):
        s = s.encode("utf8", "ignore")
    v = zlib.crc32(s)
    return v - (1 << 32) if v >= (1 << 31) else v


def partition_for_host(host: str, num_partitions: int) -> int:
    """Python modulo of the signed crc32 → always in [0, num_partitions)."""
    return signed_crc32(host) % num_partitions


def fingerprint_partition(fp_hex: str, num_partitions: int) -> int:
    """FingerprintPartitioner semantics (reference partitioners, approx):
    first 5 hex chars as int, modulo."""
    return int(fp_hex[:5], 16) % num_partitions


def hostname_local_fingerprint(url: str) -> str:
    """Host-locality fingerprint: hex( pack('>i', crc32(host)) + md5(doc) )."""
    parts = urlsplit(url)
    hostname = parts.hostname if parts.hostname else "-"
    host_checksum = signed_crc32(hostname)
    doc = f"{parts.path};{parts.query}{parts.fragment}".encode("utf8", "ignore")
    doc_md5 = hashlib.md5(doc).hexdigest()
    return hexlify(struct.pack(">i16s", host_checksum, unhexlify(doc_md5))).decode()


# ---- batch (vectorized-entry) versions -----------------------------------

def sha1_batch(urls: list[str]) -> tuple[np.ndarray, list[str]]:
    """(fp64 uint64 array, fp_hex list) for a batch of URLs."""
    n = len(urls)
    fps = np.empty(n, dtype=np.uint64)
    hexes: list[str] = [""] * n
    sha1 = hashlib.sha1
    for i, u in enumerate(urls):
        d = sha1(u.encode("utf8", "ignore")).digest()
        fps[i] = int.from_bytes(d[:8], "big")
        hexes[i] = d.hex()
    return fps, hexes


def crc32_batch(hosts: list[str]) -> np.ndarray:
    """Signed crc32 per host (int64 array to hold signed values)."""
    out = np.empty(len(hosts), dtype=np.int64)
    crc = zlib.crc32
    for i, h in enumerate(hosts):
        v = crc(h.encode("utf8", "ignore"))
        out[i] = v - (1 << 32) if v >= (1 << 31) else v
    return out


def partitions_from_host_hash(host_hash: np.ndarray, num_partitions: int) -> np.ndarray:
    """Vectorized python-modulo (numpy % on int64 matches Python for n>0)."""
    return (host_hash % num_partitions).astype(np.int32)
